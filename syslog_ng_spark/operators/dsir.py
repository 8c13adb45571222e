"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169, public): select raw-corpus examples whose hashed
n-gram distribution looks like a TARGET corpus. Three stages:

1. ``dsir_fit``: fit two bag-of-hashed-ngram models (target and raw) —
   per-bucket counts with Laplace smoothing — and return the per-bucket
   log importance ratio ``log p_target(b) - log p_raw(b)``.
2. ``dsir_logweights``: score every raw document with the sum of its
   feature-bucket log ratios (the log importance weight).
3. ``dsir_resample``: Gumbel top-k — sample k documents without
   replacement proportionally to their importance weights, with
   DETERMINISTIC noise (a pure function of the doc id) so re-runs and
   the SQL oracle reproduce the exact selection.

Spark shape (100-TB-ready):
- Features are hashed n-grams over ``B`` buckets (default 10k), so both
  fitted models and the ratio table are B-row tables — KBs, broadcast.
- Fitting is explode → bucket → groupBy(bucket): after map-side partial
  aggregation each task emits ≤ B rows, so the shuffle is bounded by
  tasks × B regardless of corpus size.
- Scoring is explode → bucket → BROADCAST join the ratio table →
  groupBy(doc) sum. A document lives in one partition, so partial
  aggregation collapses its tokens map-side and the shuffle carries ONE
  row per document, not one per token.
- Resampling: exact top-k for bounded k (per-partition top-k + driver
  merge); for corpus-scale k use ``threshold`` mode — approxQuantile
  picks the cutoff and selection becomes a narrow filter.

Every hash is the portable md5-prefix bucket (``sampling.
portable_bucket``) and the Gumbel noise is derived from it, so Spark,
DuckDB (the gate oracle) and plain Python compute identical selections.

Reference framing: the closest syslog-ng analogue is filter()-driven
routing plus rate-limit() sampling — per-message keep/drop decisions —
lifted to corpus-level distribution matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syslog_ng_spark.operators.sampling import portable_bucket

__all__ = ["dsir_fit", "dsir_logweights", "dsir_resample"]


def _feature_buckets(
    df: DataFrame, text_col: str, id_col: str, n_max: int, buckets: int
) -> DataFrame:
    """One row per (doc, feature occurrence): hashed n-gram bucket ids
    for n = 1..n_max. Single-space tokenization (the oracle-reproducible
    rule shared with operators/quality.py)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    df = df.withColumn("_tk", toks)
    a = F.col("_tk")
    def _gram_lambda(n):
        # factory closure: a default-arg lambda would grow a second
        # parameter and PySpark would pass (elem, index) into it
        return lambda i: F.concat_ws(
            " ", *[F.element_at(a, i + j) for j in range(n)]
        )

    grams = []
    for n in range(1, n_max + 1):
        if n == 1:
            grams.append(a)
        else:
            grams.append(
                F.when(
                    F.size(a) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(a) - (n - 1)),
                        _gram_lambda(n),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            )
    allgrams = F.concat(*grams) if len(grams) > 1 else grams[0]
    # explode_outer: plain explode makes InferFiltersFromGenerate inline
    # the gram build into a pushed non-codegen filter (see
    # operators/decontaminate.py); nulls are dropped right after.
    return (
        df.select(F.col(id_col), F.explode_outer(allgrams).alias("_g"))
        .filter(F.col("_g").isNotNull())
        .select(
            F.col(id_col),
            portable_bucket(F.col("_g"), denom=buckets).alias("_b"),
        )
    )


def _bucket_counts(feats: DataFrame, buckets: int) -> DataFrame:
    return feats.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-bucket log importance ratio table (``_b``, ``log_ratio``).

    Both models are Laplace-smoothed: p(b) = (count_b + 1) /
    (total + buckets), so unseen buckets get a finite ratio. The result
    has at most ``buckets`` rows — broadcast it for scoring.
    """
    tc = _bucket_counts(
        _feature_buckets(target, text_col, id_col, n_max, buckets), buckets
    ).withColumnRenamed("_c", "_ct")
    rc = _bucket_counts(
        _feature_buckets(raw, text_col, id_col, n_max, buckets), buckets
    ).withColumnRenamed("_c", "_cr")
    tt = tc.agg(F.sum("_ct").alias("_tt"))
    rt = rc.agg(F.sum("_cr").alias("_rt"))
    b = buckets
    return (
        tc.join(rc, "_b", "full")
        .join(F.broadcast(tt))
        .join(F.broadcast(rt))
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce("_ct", F.lit(0)) + 1)
                    / (F.col("_tt") + F.lit(b)).cast("double")
                )
                - F.log(
                    (F.coalesce("_cr", F.lit(0)) + 1)
                    / (F.col("_rt") + F.lit(b)).cast("double")
                )
            ).alias("log_ratio"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    ratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
    round_digits: int = 6,
) -> DataFrame:
    """(id_col, n_feats, logw): per-document log importance weight =
    sum of the document's feature-bucket log ratios. Documents with no
    features are absent (no defined weight). ``ratios`` is broadcast.
    Buckets absent from the table (possible when both fits saw nothing
    there) contribute 0."""
    feats = _feature_buckets(df, text_col, id_col, n_max, buckets)
    return (
        feats.join(F.broadcast(ratios), "_b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(
                F.sum(F.coalesce("log_ratio", F.lit(0.0))), round_digits
            ).alias("logw"),
        )
    )


def gumbel_key(logw: Column, id_col: Column, seed: str = "dsir") -> Column:
    """logw + Gumbel(0,1) noise derived deterministically from the doc
    id: u = (bucket(id) + 0.5) / 2^20 ∈ (0,1), g = -ln(-ln(u)). Pure
    function of (id, seed) — identical in Spark, DuckDB and Python."""
    u = (
        portable_bucket(id_col, denom=1 << 20, salt=seed).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    return logw + (-F.log(-F.log(u)))


def dsir_resample(
    df: DataFrame,
    ratios: DataFrame,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
    seed: str = "dsir",
    threshold: float | None = None,
    key_round_digits: int | None = 6,
) -> DataFrame:
    """Select documents by Gumbel top-k over the importance weights.

    Exactly one of ``k`` (exact distributed top-k: per-partition top-k
    + driver merge — fine for k up to ~10^6) or ``threshold`` (keep
    every doc with gumbel key above it — the corpus-scale narrow-filter
    mode; derive the cutoff once via ``approxQuantile("_gkey", ...)``)
    must be given. Returns the selected rows of ``df`` plus ``logw``.

    ``key_round_digits`` rounds the gumbel key before ordering (ties
    then break on the doc id): sub-ulp libm differences between engines
    can otherwise flip near-ties at the k-th boundary, and a training
    pipeline wants the selection bit-reproducible everywhere.
    """
    if (k is None) == (threshold is None):
        raise ValueError("pass exactly one of k= or threshold=")
    w = dsir_logweights(
        df, ratios, text_col=text_col, id_col=id_col,
        n_max=n_max, buckets=buckets,
    )
    key = gumbel_key(F.col("logw"), F.col(id_col), seed)
    if key_round_digits is not None:
        key = F.round(key, key_round_digits)
    keyed = w.withColumn("_gkey", key)
    if k is not None:
        picked = keyed.orderBy(F.desc("_gkey"), id_col).limit(k)
    else:
        picked = keyed.filter(F.col("_gkey") > threshold)
    return df.join(
        picked.select(id_col, "logw"), id_col, "inner"
    )
