"""BM25 ranked keyword retrieval over a document corpus.

Okapi BM25 (Robertson et al., public literature; the Lucene idf
variant): for query q and document d,

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                              / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

The LLM-pipeline use: keyword retrieval over a 100-TB corpus for
curation audits ("show me the top documents about X"), eval-set
neighbour inspection, and cheap lexical pre-filtering before dense
(embedding) rerank — the classic hybrid-retrieval first stage.

Spark shape (100-TB-ready):
- Query terms are a tiny table → BROADCAST; the corpus token explode is
  immediately reduced by the broadcast join, so only occurrences of
  QUERY terms survive — the shuffle that computes tf carries one row
  per (doc, query, matching term occurrence), zero rows for the
  overwhelmingly-non-matching corpus.
- Document length is document-local (a size() column, no shuffle);
  corpus aggregates (N, avgdl) are one tiny 1-row frame, broadcast.
- df(t) is counted only for the query terms (a ≤|terms| row table).
- Per-query top-k is a window over the scored (query, doc) rows — rows
  only for documents matching ≥ 1 term.

Reference framing: syslog-ng's closest analogue is filter(match(...))
routing — boolean keyword selection; BM25 lifts it to ranked retrieval
with corpus statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "hybrid_topk"]


def _doc_tokens(df: DataFrame, text_col: str, id_col: str, extra=()) -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    df = df.withColumn("_tk", toks)
    # explode_outer: see operators/decontaminate.py (InferFilters trap)
    return (
        df.select(id_col, *extra, F.size("_tk").alias("_dl"),
                  F.explode_outer("_tk").alias("_tok"))
        .filter(F.col("_tok").isNotNull())
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries``: (query_id_col, query_text_col) — whitespace keyword
    queries, lowercased like the corpus. Returns (query_id, id_col,
    score, rank) with rank 1..k per query; ties break on the doc id so
    the ranking is deterministic. Documents matching no query term
    never appear (score 0).
    """
    # corpus-wide stats: one row, broadcast
    dls = df.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
        ).alias("_dl"),
    )
    stats = dls.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )

    qterms = (
        queries.select(
            query_id_col,
            F.explode_outer(
                F.filter(
                    F.split(F.lower(F.col(query_text_col)), " "),
                    lambda t: t != "",
                )
            ).alias("_tok"),
        )
        .filter(F.col("_tok").isNotNull())
        .distinct()
    )
    terms = qterms.select("_tok").distinct()

    # exact-token PREFILTER before the explode: only docs whose token
    # array overlaps the query-term set are exploded and joined — the
    # full corpus pays one tokenize + set-probe per row instead of
    # shuffling every token occurrence into the broadcast join (a
    # substring contains() prefilter was tried first and measured
    # SLOWER: short terms substring-match most tokens, so it filtered
    # nothing and added a scan per term). Collecting the term list is
    # bounded by the operator contract (queries are a tiny table);
    # skipped for >1024 terms to keep the literal array small.
    terms_local = [r["_tok"] for r in terms.collect()]
    if not terms_local:
        cand = df.filter(F.lit(False))
    elif len(terms_local) <= 1024:
        tk = F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        )
        cand = df.filter(F.arrays_overlap(tk, F.lit(terms_local)))
    else:
        cand = df
    toks = _doc_tokens(cand, text_col, id_col)

    # occurrences of query terms only: broadcast join prunes the corpus
    hits = toks.join(F.broadcast(terms), "_tok")
    tf = hits.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfreq = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))

    scored = (
        tf.join(F.broadcast(dfreq), "_tok")
        .join(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (
                F.col("_tf")
                + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
        .join(F.broadcast(qterms), "_tok")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_s"), round_digits).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hybrid_topk(
    df: DataFrame,
    queries: DataFrame,
    emb: DataFrame,
    qvecs: DataFrame,
    k: int = 10,
    k_lex: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    qvec_col: str = "qvec",
    round_digits: int = 6,
) -> DataFrame:
    """Hybrid retrieval: BM25 candidate generation, dense cosine rerank.

    The classic two-stage search: :func:`bm25_topk` picks ``k_lex``
    lexical candidates per query, then the exact cosine between the
    query vector (``qvecs``: query_id_col, qvec_col) and each
    candidate's embedding reranks them; top ``k`` survive. Returns
    (query_id, id_col, bm25, cos, rank).

    Scale shape: the candidate set is queries × k_lex rows — BROADCAST
    into the embeddings join, so the corpus embedding table is probed
    map-side and never shuffles; the rerank window runs over candidate
    rows only.
    """
    from syslog_ng_spark.operators.similarity import cosine

    cands = bm25_topk(
        df, queries, k=k_lex, text_col=text_col, id_col=id_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
        round_digits=round_digits,
    ).select(query_id_col, id_col, F.col("score").alias("bm25"))
    vecs = emb.select(
        F.col(vec_id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    qv = qvecs.select(
        query_id_col, F.col(qvec_col).cast("array<double>").alias("_qv")
    )
    j = (
        vecs.join(F.broadcast(cands), id_col)
        .join(F.broadcast(qv), query_id_col)
        .withColumn(
            "cos", F.round(cosine(F.col("_v"), F.col("_qv")), round_digits)
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "bm25", "cos", "rank")
    )
