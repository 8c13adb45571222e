"""Corpus-level statistical quality scoring: unigram language-model
log-probability per document (the CCNet-style "how much does this text
look like the corpus" signal used to rank/filter pre-training data).

Two-phase shape, both phases standard Spark aggregate plans:

1. ``unigram_stats``: tokenize + count — the word-count shape (explode →
   partial/final hash aggregate on the token). Map-side combine means the
   shuffle carries one row per DISTINCT token per task, not per token
   occurrence.
2. ``unigram_logprob``: score each document by the mean ln p(token)
   under those counts. Exact mode joins occurrences to the vocab on the
   token (shuffle hash join — fine: both sides are token-keyed and the
   vocab side is tiny after aggregation). For 100 TB the better plan is
   ``vocab_limit``: keep the top-K vocabulary, BROADCAST it, and give
   out-of-vocabulary tokens a floor probability — one broadcast join, no
   token shuffle for the corpus side beyond the explode.

Tokenization is a literal single-space split with empties dropped —
deliberately the simplest rule that DuckDB (``string_split``) reproduces
byte-for-byte, so the gate oracle can recompute the entire pipeline.
Run ``operators/normalize.py`` first for whitespace canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_stats", "unigram_logprob"]


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # explode_OUTER + null filter on the OUTPUT: plain explode triggers
    # InferFiltersFromGenerate, re-inlining the split into a pushed
    # non-codegen filter that runs the tokenizer twice per row (see
    # operators/decontaminate.py). Token-less docs emit one null row,
    # dropped here (the filter stays above the Generate).
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        df.select(F.col(id_col), F.explode_outer(toks).alias("_tok"))
        .filter(F.col("_tok").isNotNull())
    )


def unigram_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus unigram counts: one row per distinct token with its
    occurrence count (``_tok``, ``c``)."""
    return _tokens(df, text_col, id_col).groupBy("_tok").agg(
        F.count(F.lit(1)).alias("c")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
    vocab_limit: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document mean unigram log-probability.

    Returns (id_col, n_tokens, logprob) — higher (less negative) means
    the document's tokens are common in the corpus; rare-garbage
    documents rank at the bottom. Documents with no tokens are absent
    (no defined score).

    ``vocab``: pre-fit counts from :func:`unigram_stats` (e.g. fit on a
    sample or a reference corpus); defaults to fitting on ``df`` itself.
    ``vocab_limit``: keep only the top-K tokens, broadcast the vocab,
    and score out-of-vocabulary tokens at the floor probability
    ``1/total`` — the 100-TB plan (no token-keyed shuffle join).
    """
    toks = _tokens(df, text_col, id_col)
    if vocab is None:
        vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("c"))
    # total BEFORE any vocab truncation: p() stays a true probability.
    total = vocab.agg(F.sum("c").cast("double").alias("_total"))
    if vocab_limit is not None:
        vocab = vocab.orderBy(F.desc("c"), "_tok").limit(vocab_limit)
        joined = toks.join(F.broadcast(vocab), "_tok", "left").withColumn(
            "c", F.coalesce("c", F.lit(1).cast("long"))  # OOV floor: 1/total
        )
    else:
        joined = toks.join(vocab, "_tok")
    return (
        joined.join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("_total"))), round_digits).alias(
                "logprob"
            ),
        )
    )
