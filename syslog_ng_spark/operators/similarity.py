"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k: broadcast the query set,
  dot products via ``zip_with``/``aggregate`` (JVM-side), window top-k.
  The correctness baseline; O(N·Q) but embarrassingly parallel and
  shuffle-free until the final tiny top-k.
- ``lsh_topk`` — random-hyperplane LSH: deterministic projection
  hyperplanes derived from xxhash (no stored model), sign-bit bucket
  join shrinks candidates, exact rerank inside buckets. The 100 TB path:
  probe cost scales with bucket occupancy, not corpus size.
- ``embedding_near_dup`` — near-duplicate pairs by cosine ≥ threshold
  using the same LSH bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Broadcast joined against the
    corpus (no shuffle of the big side); per-query top-k via window.
    Corpus norms are computed inline — for repeated querying, pre-store
    them (norm is a narrow derived column).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q)).withColumn(
        "cos", cosine(F.col(vec_col), F.col("_qvec"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign of <vec, h_plane> with pseudo-random hyperplane h derived
    deterministically from xxhash64(plane, dim_index) — no model to ship."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2001)) - 1000
                ).cast("double")
                / 1000.0,
            ),
            lambda v, h: v * h,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj > 0).cast("int")


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Pack n sign bits into a bucket id (random-hyperplane LSH)."""
    bits = [_hyperplane_sign(vec, p, dim) for p in range(n_planes)]
    bucket = F.lit(0)
    for b in bits:
        bucket = F.shiftleft(bucket, 1) + b
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int = 64,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket, exact rerank inside.

    Recall improves with fewer planes (bigger buckets) — n_planes trades
    candidate count vs recall. ``multiprobe=n`` additionally probes every
    bucket at Hamming distance 1 over the first n planes (the classic
    multi-probe trick): ~n× candidates on the QUERY side only — the
    corpus is neither re-bucketed nor re-scanned, the probe fan-out rides
    the broadcast.
    """
    cb = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), n_planes, dim))
    qbase = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("_b0"),
    )
    probes = [F.col("_b0")] + [
        F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(min(multiprobe, n_planes))
    ]
    qb = qbase.select(
        query_id_col,
        "_qvec",
        F.explode(F.array(*probes)).alias("_bucket"),
    )
    cand = (
        cb.join(F.broadcast(qb), "_bucket")
        .withColumn("cos", cosine(F.col(vec_col), F.col("_qvec")))
        .dropDuplicates([query_id_col, id_col])
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cos"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold, LSH-bucketed."""
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("_bucket"),
    )
    a2, b2 = b.alias("a"), b.alias("b")
    return (
        a2.join(
            b2,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("cos", cosine(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("cos")
        )
    )
