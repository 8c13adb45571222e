"""100×-class scale stress for the round-5 zero-corpus-shuffle rewrites:
repetition_stats (arrow engine) and decontaminate (document-local
distinct). Deterministic synthetic corpus; run ALONE on an idle host.

Usage: python tools/scale_rep_decon.py [n_docs] [--skip-gen]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DATA = "/tmp/scale_rep_decon/docs"


def gen(spark):
    """~30-token, 4-line docs; 20% carry a within-doc duplicated line
    (planted boilerplate) so the repetition signals are non-trivial."""
    d = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")

    def line(seed):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("doc_id") * 37 + i * 101 + seed),
                        F.lit(5000),
                    ),
                ),
            ),
            " ",
        )
    planted = F.pmod(F.col("doc_id"), F.lit(5)) == 0
    text = F.concat_ws(
        "\n",
        line(1),
        line(2),
        line(3),
        F.when(planted, line(2)).otherwise(line(4)),
    )
    d.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(DATA)


def main():
    spark = get_spark(cpus=32)
    if "--skip-gen" not in sys.argv:
        t = time.time()
        gen(spark)
        print(f"gen {N_DOCS:,} docs: {time.time()-t:.1f}s", flush=True)

    docs = spark.read.parquet(DATA)

    # --- repetition_stats, full Gopher config (9 n values), arrow ----
    from syslog_ng_spark.operators.repetition import repetition_stats

    t = time.time()
    out = repetition_stats(docs)
    agg = out.agg(
        F.count("*").alias("n"),
        F.avg("dup_line_frac").alias("avg_dlf"),
        F.avg("dup_line_char_frac").alias("avg_dlcf"),
        F.avg("top_2gram_char_frac").alias("avg_top2"),
        F.avg("dup_5gram_char_frac").alias("avg_dup5"),
        F.avg("dup_10gram_char_frac").alias("avg_dup10"),
    ).collect()[0]
    rep_s = time.time() - t
    print(
        f"repetition_stats(arrow, 9 ns): {rep_s:.1f}s = "
        f"{N_DOCS/rep_s:,.0f} docs/s  {dict(agg.asDict())}",
        flush=True,
    )
    # sanity: planted 20% should dominate dup_line_frac ≈ 0.2 * 0.5
    assert 0.05 < agg["avg_dlf"] < 0.2, agg["avg_dlf"]

    # --- decontaminate, n=5, 50k-doc benchmark slice ----------------
    from syslog_ng_spark.operators.decontaminate import decontaminate

    bench = docs.filter(F.col("doc_id") % F.lit(max(N_DOCS // 50_000, 1)) == 0)
    t = time.time()
    flagged = decontaminate(docs, bench, n=5)
    agg2 = flagged.agg(
        F.count("*").alias("n"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contam"),
        F.sum("n_overlap").alias("tot_overlap"),
        F.sum("n_grams").alias("tot_grams"),
    ).collect()[0]
    dec_s = time.time() - t
    print(
        f"decontaminate(n=5, bench=50k): {dec_s:.1f}s = "
        f"{N_DOCS/dec_s:,.0f} docs/s  {dict(agg2.asDict())}",
        flush=True,
    )
    # every benchmark member is trivially contaminated by itself
    assert agg2["n_contam"] >= 50_000 - 1, agg2["n_contam"]


if __name__ == "__main__":
    main()
