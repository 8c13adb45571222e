"""End-to-end curation composite at 10M documents: the curation_pipeline
gate stages (normalize → PII-scrub → exact dedup → token-count gate →
sequence packing) chained over the 10M-doc corpus from
tools/scale_rep_decon.py, with planted duplicates and PII. Run ALONE.
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

DATA = "/tmp/scale_rep_decon/docs"


def main():
    spark = get_spark(cpus=32)
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
    # the 1-in-7 planted dups collapse to 40 representatives
    expect_kept = n - n // 7 + 40 - (1 if 1 % 7 == 1 else 0)
    print(f"docs_kept={agg['docs_kept']:,} (~{expect_kept:,} expected)")


if __name__ == "__main__":
    main()
