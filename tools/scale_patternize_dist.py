"""Distributed-strategy patternize at 10M lines (round-6 verdict item 6):
the escape hatch for corpora whose frequent-word set exceeds
max_broadcast_words. Runs BOTH strategies on the same materialized
corpus and asserts identical (pattern, support) sets — the toy-size
equivalence tests, proven at scale. Run ALONE.
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

DATA = "/tmp/scale_patternize/lines"
N = 10_000_000
SUPPORT = 100_000  # 1%


def main():
    spark = get_spark(cpus=32)

    # 40% template A (job id + bounded queue param), 30% template B,
    # 30% unique-word noise — ~7M distinct parameter words stress the
    # frequent-set join, the exact shape the distributed path exists for
    mod = F.pmod("id", F.lit(10))
    text = (
        F.when(
            mod < 4,
            F.format_string(
                "svc alpha started job j%d in queue q%d",
                F.col("id"),
                F.pmod("id", F.lit(64)),
            ),
        )
        .when(
            mod < 7,
            F.format_string(
                "svc beta finished task t%d code c%d",
                F.col("id"),
                F.pmod("id", F.lit(1000)),
            ),
        )
        .otherwise(
            F.format_string("w%da w%db w%dc", F.col("id"), F.col("id"), F.col("id"))
        )
    )
    spark.range(N).select(
        F.col("id").alias("rid"), text.alias("msg")
    ).repartition(64).write.mode("overwrite").parquet(DATA)
    corpus = spark.read.parquet(DATA)

    from syslog_ng_spark.operators.patternize import patternize

    results = {}
    for strategy in ("distributed", "broadcast"):
        t0 = time.time()
        clusters = patternize(
            corpus,
            support=SUPPORT,
            msg_col="msg",
            num_samples=0,
            id_col="rid",
            strategy=strategy,
        )
        got = {
            (r["pattern"], int(r["support"]))
            for r in clusters.select("pattern", "support").collect()
        }
        wall = time.time() - t0
        results[strategy] = got
        print(
            f"{strategy}: {wall:.1f}s = {N / wall:,.0f} lines/s, "
            f"{len(got)} clusters"
        )
        for p, s in sorted(got):
            print(f"  support={s:,}  {p[:90]}")

    assert results["distributed"] == results["broadcast"], (
        "strategy divergence:\n"
        f"dist only: {results['distributed'] - results['broadcast']}\n"
        f"bcast only: {results['broadcast'] - results['distributed']}"
    )
    # the planted templates must be found with their planted supports
    supports = sorted(s for _, s in results["distributed"])
    assert supports == [3_000_000, 4_000_000], supports
    print("EQUIVALENCE OK: distributed == broadcast at 10M lines")


if __name__ == "__main__":
    main()
