"""Deterministic corpus sampling for training-data mixing: per-source
up/down-sampling ("data mixing") and a deterministic global shuffle with
shard assignment for training-set export.

Why deterministic: a training pipeline re-run must produce byte-identical
shards (resume, audit, decontamination diffing). ``rand()`` is
non-reproducible across retries/partitionings, so every decision here is
a pure function of the row's id: the sampling coin is an md5-prefix hash
bucket, computable identically in Spark, DuckDB (the gate oracle) and
plain Python.

Scale shape:
- ``mix_sources`` is ZERO-shuffle: one narrow projection computes the
  per-row copy count from a literal CASE over the (small) weight table,
  then ``explode`` emits the copies. 100 TB in, weighted mixture out,
  no exchange anywhere.
- ``shuffle_shards`` is exactly ONE shuffle (hash exchange on the shard
  id) followed by an in-partition sort — the minimum possible for a
  global permutation. ``n_shards`` is the parallelism: pick it so a
  shard fits one output file (~1-4 GB), i.e. thousands at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "portable_bucket",
    "mix_sources",
    "shuffle_shards",
    "stratified_sample_exact",
]


def portable_bucket(col: Column, denom: int = 10_000, salt: str = "") -> Column:
    """Deterministic hash bucket in ``[0, denom)``: the first 8 hex chars
    of md5(salt || str(value)), mod ``denom``. md5 is available with
    identical semantics in Spark (``F.md5``), DuckDB
    (``('0x'||substr(md5(x),1,8))::UBIGINT``) and Python — the property
    the oracle gate and any off-Spark auditing rely on."""
    s = col.cast("string") if not salt else F.concat(F.lit(salt), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % denom


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    denom: int = 10_000,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Weighted per-group resampling (training-data domain mixing).

    ``weights[g] = w`` keeps each row of group ``g`` ``floor(w)`` times,
    plus one more time for the deterministic ``frac(w)`` fraction of rows
    (hash-bucket coin on ``id_col``). ``w=0`` drops the group, ``w<1``
    downsamples, ``w>1`` oversamples with ``copy_col`` numbering the
    copies 0..k-1 (so a downstream epoch-aware loader can interleave
    them). Groups absent from ``weights`` get ``default_weight``.

    Fractions are quantized to 1/denom; the expectation over a uniform
    id-hash is exactly ``round(frac*denom)/denom`` per row, and the
    SELECTION (not just the rate) is reproducible run-to-run.
    """
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for group {g!r}: {w}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight: {default_weight}")

    bucket = portable_bucket(F.col(id_col), denom)

    def copies_expr(w: float) -> Column:
        n_full = int(w)
        thresh = round((w - n_full) * denom)
        c: Column = F.lit(n_full).cast("long")
        if thresh > 0:
            c = c + F.when(bucket < thresh, 1).otherwise(0).cast("long")
        return c

    copies: Column = copies_expr(default_weight)
    for g, w in sorted(weights.items()):
        copies = F.when(F.col(group_col) == g, copies_expr(w)).otherwise(copies)

    # explode(empty array) drops the row, so copies==0 needs no filter;
    # sequence() must be guarded (sequence(0, -1) counts DOWN in Spark).
    seq = F.when(
        copies > 0, F.sequence(F.lit(0).cast("long"), copies - 1)
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn(copy_col, F.explode(seq))


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: every row gets a ``shard`` in ``[0, n_shards)`` and a 1-based
    ``pos`` within its shard, both pure functions of ``(salt, id)``.

    The permutation key is the full md5 hex of ``salt || id`` — shard
    from its 32-bit prefix, in-shard order by (key, id). Change ``salt``
    to get an independent epoch permutation of the same corpus.

    Plan: one hash exchange on ``shard`` + an in-partition sort for the
    row_number — no global ordering bottleneck (each shard sorts
    independently; parallelism == n_shards, so pick n_shards >= cluster
    cores at scale).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sid = F.col(id_col).cast("string")
    key = F.md5(F.concat(F.lit(salt), sid) if salt else sid)
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).alias(shard_col)
    out = df.withColumn("_skey", key).withColumn(shard_col, shard)
    w = Window.partitionBy(shard_col).orderBy("_skey", id_col)
    return out.withColumn(pos_col, F.row_number().over(w).cast("long")).drop("_skey")


def stratified_sample_exact(
    df: DataFrame,
    k: int | dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    default_k: int | None = None,
    prefilter: bool = True,
    prefilter_factor: float = 4.0,
    rank_col: str | None = None,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sampling ("balance the
    languages to 1M docs each").

    The kept set is the k rows of each stratum with the SMALLEST
    ``md5(salt || id)`` — a pure function of (salt, id), so re-runs,
    retries and different partitionings return byte-identical samples
    (the property every decision in this module guarantees), and a
    fresh ``salt`` draws an independent sample. ``k`` may be a dict
    ``{stratum: k}`` (missing strata get ``default_k``;
    ``default_k=None`` or 0 drops them).

    Scale shape: the naive plan shuffles the WHOLE corpus into the
    per-stratum window sort. With ``prefilter=True`` (default) a first
    cheap aggregate counts each stratum (rows: one per stratum — tiny,
    broadcast back), and only rows whose hash falls below
    ``prefilter_factor * k / n`` of the key space enter the window —
    ~factor*k rows per stratum cross the wire instead of n. Because the
    prefilter keys on the SAME hash that defines the sample, the true
    top-k survive it whenever at least k rows do; the underfill
    probability at factor f is Chernoff-bounded by exp(-k(f-1)^2/2f)
    (~1e-23 at k=100, f=4). Exactness is still UNCONDITIONAL: a second
    tiny aggregate audits survivor counts, and any underfilled stratum
    (or one smaller than k, where "all rows" is the right answer) is
    re-ranked WITHOUT the prefilter and unioned back — the fallback
    branch reads the corpus again but only keeps those strata, so the
    common case stays one full scan + one ~k-per-stratum shuffle.

    ``rank_col`` optionally exposes the 1-based hash rank.
    """
    if isinstance(k, int):
        k_expr = F.lit(int(k))
        max_k = int(k)
        if k < 0:
            raise ValueError(f"k must be >= 0, got {k}")
    else:
        if not k and default_k is None:
            raise ValueError("empty k dict with no default_k")
        for s, v in k.items():
            if v < 0:
                raise ValueError(f"k must be >= 0 for stratum {s!r}: {v}")
        base = F.lit(int(default_k)) if default_k is not None else F.lit(0)
        k_expr = base
        for s, v in sorted(k.items()):
            k_expr = F.when(F.col(strata_col) == s, F.lit(int(v))).otherwise(
                k_expr
            )
        max_k = max([*k.values(), default_k or 0])
    if prefilter_factor <= 1.0:
        raise ValueError(f"prefilter_factor must be > 1, got {prefilter_factor}")

    sid = F.col(id_col).cast("string")
    key = F.md5(F.concat(F.lit(salt), sid) if salt else sid)
    # 60-bit numeric prefix of the key for threshold comparison (15 hex
    # chars keep the conv() result positive in a signed long)
    key_num = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    keyed = df.withColumn("_skey", key).withColumn("_k", k_expr)

    w = Window.partitionBy(strata_col).orderBy("_skey", id_col)

    def _rank_keep(frame: DataFrame) -> DataFrame:
        ranked = frame.withColumn("_rank", F.row_number().over(w))
        kept = ranked.filter(F.col("_rank") <= F.col("_k"))
        if rank_col is not None:
            kept = kept.withColumn(rank_col, F.col("_rank").cast("long"))
        return kept.drop("_rank", "_skey", "_k")

    if not prefilter or max_k == 0:
        return _rank_keep(keyed)

    # NULL-safe stratum joins throughout: groupBy and Window treat NULL
    # as a regular group, but equi-joins drop NULL keys — with plain
    # joins the whole NULL stratum (realistic: failed lang detection)
    # silently landed in NEITHER the safe nor the unsafe branch while
    # prefilter=False sampled it (ADVICE r6, high).
    def _nsjoin(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
        r = right.withColumnRenamed(strata_col, "_strat_r")
        out = left.join(
            F.broadcast(r),
            F.col(strata_col).eqNullSafe(F.col("_strat_r")),
            how,
        )
        return out.drop("_strat_r") if how != "left_semi" else out

    counts = (
        df.groupBy(strata_col).count().withColumnRenamed("count", "_n")
    )
    frac = F.least(
        F.lit(1.0),
        F.lit(float(prefilter_factor)) * F.col("_k").cast("double") / F.col("_n"),
    )
    keyed = _nsjoin(keyed, counts, "left").withColumn(
        "_thresh", (frac * float(2**60)).cast("long")
    )
    survivors = keyed.filter(key_num < F.col("_thresh"))

    # audit: a stratum is safe iff the prefilter kept >= min(k, n) rows.
    # Built from `counts` (every stratum), NOT from the survivors — a
    # stratum whose prefilter kept ZERO rows has no survivor row at all
    # and must still land in the unsafe set, not silently vanish.
    surv_counts = survivors.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("_kept")
    )
    audit = (
        counts.withColumn("_ka", k_expr)
        .join(
            surv_counts.withColumnRenamed(strata_col, "_strat_s"),
            F.col(strata_col).eqNullSafe(F.col("_strat_s")),
            "left",
        )
        .drop("_strat_s")
        .withColumn("_kept", F.coalesce("_kept", F.lit(0)))
        .withColumn(
            "_ok",
            (F.col("_kept") >= F.least("_ka", "_n")) | (F.col("_ka") == 0),
        )
    )
    ok_set = audit.select(strata_col, "_ok")
    safe = _nsjoin(
        survivors, ok_set.filter(F.col("_ok")).drop("_ok"), "left_semi"
    )
    unsafe = _nsjoin(
        keyed, ok_set.filter(~F.col("_ok")).drop("_ok"), "left_semi"
    )
    out = _rank_keep(safe.drop("_n", "_thresh"))
    fallback = _rank_keep(unsafe.drop("_n", "_thresh"))
    return out.unionByName(fallback)
