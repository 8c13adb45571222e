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

__all__ = ["gopher_rules", "unigram_stats", "unigram_logprob"]


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


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    required_stopwords: tuple = ("the", "be", "to", "of", "and", "that", "have", "with"),
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    public paper; defaults are the paper's published thresholds). One
    boolean audit column per rule plus the conjunction ``gopher_keep``,
    so rejected docs are EXPLAINABLE (which rule fired), not just gone —
    the curation analogue of the engine's non-silent-drop contract
    (rate-limit / LSH-cap audits).

    Every signal is a pure Column over one pass of the text — split,
    filter, aggregate higher-order functions — so the whole rule set
    runs inside the scan's projection with no shuffle and no UDF, and a
    SQL engine (the DuckDB gate oracle) reproduces it bit-for-bit:

    * ``n_words``/word bounds — whitespace tokens, the paper's "words".
    * ``mean_word_len`` — integer length sum / count, exact double.
    * symbol ratio — '#' chars + '...' occurrences per word.
    * bullet / ellipsis line fractions — over LINES (split on \\n),
      bullets '-', '*', '•' after left-trim; ellipsis after right-trim.
    * alpha word fraction — words containing [a-zA-Z].
    * stopword hits — DISTINCT required stopwords present (lowercased
      exact token match), >= ``min_stopword_hits`` of them.

    Empty/whitespace-only docs fail the word-count rule and every
    fraction is defined as 0 (no NULL propagation into the keep flag).
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    lines = F.split(c, r"\n")
    out = df.withColumn("_w", words).withColumn("_l", lines)
    w, l = F.col("_w"), F.col("_l")
    n_words = F.size(w)
    n_lines = F.size(l)
    safe_w = F.when(n_words > 0, n_words.cast("double")).otherwise(F.lit(1.0))
    safe_l = F.when(n_lines > 0, n_lines.cast("double")).otherwise(F.lit(1.0))

    mean_wl = (
        F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / safe_w
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\."), F.lit(0)))
    sym_ratio = (n_hash + n_ellipsis) / safe_w
    bullet_frac = (
        F.size(F.filter(l, lambda x: F.ltrim(x).rlike(r"^[-*•]")))
        / safe_l
    )
    ell_frac = (
        F.size(F.filter(l, lambda x: F.rtrim(x).rlike(r"\.\.\.$"))) / safe_l
    )
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike(r"[a-zA-Z]"))) / safe_w
    )
    sw = F.array(*[F.lit(s) for s in required_stopwords])
    lw = F.transform(w, F.lower)
    stop_hits = F.size(F.filter(sw, lambda s: F.array_contains(lw, s)))

    guards = {
        # greatest(x, 0): size() returns -1 (not NULL) for NULL arrays
        # under the engine's ANSI-off sessions, so coalesce alone let
        # the audit columns report -1 for NULL text instead of the
        # documented 0 (ADVICE r6); greatest also skips NULLs
        "n_words": F.greatest(F.coalesce(n_words, F.lit(0)), F.lit(0)),
        "mean_word_len": F.round(F.coalesce(mean_wl, F.lit(0.0)), 4),
        "stop_hits": F.greatest(F.coalesce(stop_hits, F.lit(0)), F.lit(0)),
    }
    rules = {
        "r_word_count": (F.coalesce(n_words, F.lit(0)) >= min_words)
        & (F.coalesce(n_words, F.lit(0)) <= max_words),
        "r_mean_word_len": (F.coalesce(mean_wl, F.lit(0.0)) >= min_mean_word_len)
        & (F.coalesce(mean_wl, F.lit(0.0)) <= max_mean_word_len),
        "r_symbol_ratio": F.coalesce(sym_ratio, F.lit(0.0)) <= max_symbol_ratio,
        "r_bullet_lines": F.coalesce(bullet_frac, F.lit(0.0))
        <= max_bullet_line_frac,
        "r_ellipsis_lines": F.coalesce(ell_frac, F.lit(0.0))
        <= max_ellipsis_line_frac,
        "r_alpha_words": F.coalesce(alpha_frac, F.lit(0.0))
        >= min_alpha_word_frac,
        "r_stopwords": F.coalesce(stop_hits, F.lit(0)) >= min_stopword_hits,
    }
    for name, expr in {**guards, **rules}.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep).drop("_w", "_l")
