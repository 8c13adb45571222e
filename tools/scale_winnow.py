"""Winnowing at scale: fingerprint throughput at 10M docs and the
recall-1 guarantee on planted shared passages at 2M docs.

The guarantee under test (the reason this family exists next to
minhash/simhash): any shared token run of length >= window + k - 1
yields >= 1 shared fingerprint, so EVERY planted pair must surface in
winnow_pairs — recall is exact, not probabilistic. Run ALONE (one
local[32] session owns the machine)."""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

N_FPS = 10_000_000
N_PAIRS = 2_000_000
K, W = 5, 4
PATH = "/tmp/scale_winnow/docs"


def build(spark, n):
    """60-token docs; every doc with even id shares a 12-token passage
    (>= W+K-1 = 8 tokens) with id+1, passage keyed on id//2 so each
    planted pair is unique — buckets stay size 2, no quadratic blowup."""
    d = spark.range(n).withColumnRenamed("id", "doc_id")
    i = F.col("doc_id")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(48)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(i * 131 + j * 17), F.lit(5000))
            ),
        ),
        " ",
    )
    passage = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda j: F.concat(
                F.lit("p"),
                F.pmod(F.xxhash64(F.floor(i / 2) * 977 + j), F.lit(100000)),
            ),
        ),
        " ",
    )
    text = F.concat(body, F.lit(" "), passage)
    d.select("doc_id", text.alias("text")).repartition(128).write.mode(
        "overwrite"
    ).parquet(PATH)


def main():
    spark = get_spark(cpus=32)

    from syslog_ng_spark.operators.winnow import winnow_fingerprints, winnow_pairs

    # -- throughput: pandas kernel over 10M docs, no shuffle
    t0 = time.time()
    build(spark, N_FPS)
    print(f"datagen {N_FPS}: {time.time()-t0:.1f}s", flush=True)
    docs = spark.read.parquet(PATH)
    t0 = time.time()
    n_fp = winnow_fingerprints(docs, k=K, window=W).count()
    dt = time.time() - t0
    print(
        f"winnow_fingerprints 10M x ~57 grams: {N_FPS/dt:,.0f} docs/s "
        f"({dt:.1f}s), {n_fp:,} fingerprints (~{n_fp/N_FPS:.1f}/doc)",
        flush=True,
    )

    # -- recall guarantee at 2M docs: every planted pair must surface
    t0 = time.time()
    build(spark, N_PAIRS)
    docs = spark.read.parquet(PATH)
    print(f"pair datagen {N_PAIRS}: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    pairs = winnow_pairs(docs, k=K, window=W, threshold=0.01).select(
        "id_a", "id_b"
    )
    # planted pair = (2m, 2m+1): id_a even, id_b = id_a + 1
    planted_found = pairs.filter(
        (F.col("id_a") % 2 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    total = pairs.count()
    dt = time.time() - t0
    expect = N_PAIRS // 2
    print(
        f"winnow_pairs 2M docs: {dt:.1f}s, planted pairs found "
        f"{planted_found:,}/{expect:,} (recall "
        f"{planted_found/expect:.6f}, MUST be 1.0), "
        f"{total - planted_found:,} extra candidate pairs above 0.01",
        flush=True,
    )
    assert planted_found == expect, "winnowing guarantee violated"
    spark.stop()


if __name__ == "__main__":
    main()
