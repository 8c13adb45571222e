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

__all__ = ["portable_bucket", "mix_sources", "shuffle_shards"]


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
