"""End-to-end curation composite at scale: the curation_pipeline gate
stages (normalize → PII-scrub → exact dedup → token-count gate →
sequence packing) chained over a synthetic corpus with planted
duplicates and PII, with exactness invariants asserted at full scale
(pack offsets == token totals, dedup counts vs planted rates) — the
class of check that caught the sampled-exchange determinism bug in
round 5. Run ALONE.

Usage: python tools/scale_curation.py [n_docs] [--skip-gen]
(default 10M; round-6 verdict item 8 runs 100M)
"""

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

N_DOCS = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1].isdigit()
    else 10_000_000
)
DATA = f"/tmp/scale_curation/docs_{N_DOCS}"


def gen(spark):
    """Same 4-line 32-token doc shape as tools/scale_rep_decon.py."""
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

    text = F.concat_ws("\n", line(1), line(2), line(3), line(4))
    d.select("doc_id", text.alias("text")).repartition(256).write.mode(
        "overwrite"
    ).parquet(DATA)


def main():
    spark = get_spark(cpus=32)
    if "--skip-gen" not in sys.argv or not os.path.exists(DATA):
        t0 = time.time()
        gen(spark)
        print(f"gen {N_DOCS:,} docs: {time.time() - t0:.1f}s", flush=True)
    docs = spark.read.parquet(DATA)
    n = docs.count()

    # plant: 1-in-7 docs collapse into 40 exact-dup boilerplate groups,
    # 1-in-3 of the rest carry an email + IPv4
    docs = docs.withColumn(
        "text",
        F.when(
            F.pmod("doc_id", F.lit(7)) == 1,
            F.format_string(
                "duplicate boilerplate block %d end", F.pmod("doc_id", F.lit(40))
            ),
        ).otherwise(F.col("text")),
    ).withColumn(
        "text",
        F.when(
            (F.pmod("doc_id", F.lit(3)) == 0) & (F.pmod("doc_id", F.lit(7)) != 1),
            F.concat(
                F.col("text"),
                F.format_string(
                    " contact u%d@example.com from 10.%d.0.9",
                    F.pmod("doc_id", F.lit(50)),
                    F.pmod("doc_id", F.lit(256)),
                ),
            ),
        ).otherwise(F.col("text")),
    )

    from syslog_ng_spark.operators.dedup import exact_dedup
    from syslog_ng_spark.operators.normalize import normalize_text
    from syslog_ng_spark.operators.packing import pack_chunked
    from syslog_ng_spark.operators.pii import pii_scrub
    from syslog_ng_spark.operators.textstats import token_count

    t = time.time()
    out = normalize_text(docs, "text")
    out = pii_scrub(out, "text", kinds=("email", "ipv4"))
    out = exact_dedup(out)
    out = out.withColumn(
        "n_tokens", token_count(F.col("text")).cast("long")
    ).filter(F.col("n_tokens") >= 5)
    out = pack_chunked(out, budget=2048)
    agg = out.agg(
        F.count("*").alias("docs_kept"),
        F.countDistinct("pack_first").alias("packs"),
        F.sum("n_tokens").alias("tokens"),
        F.max(F.col("start_off") + F.col("n_tokens")).alias("end_off"),
    ).collect()[0]
    wall = time.time() - t
    print(
        f"curation_pipeline end-to-end: {wall:.1f}s = {n/wall:,.0f} docs/s "
        f"{dict(agg.asDict())}",
        flush=True,
    )
    # exactness: the last pack offset ends exactly at the token total
    assert agg["end_off"] == agg["tokens"], (agg["end_off"], agg["tokens"])
    # the 1-in-7 planted dups (doc_id % 7 == 1) collapse to exactly 40
    # representatives; the synthetic non-dup docs are unique by
    # construction (32 hash-drawn tokens)
    planted = (n - 2) // 7 + 1 if n >= 2 else 0
    expect_kept = n - planted + 40
    assert agg["docs_kept"] == expect_kept, (agg["docs_kept"], expect_kept)
    print(f"docs_kept={agg['docs_kept']:,} == planted-rate expectation")


if __name__ == "__main__":
    main()
