"""chunk_documents at 10M documents: throughput + exactness invariants
at scale (disjoint chunks reconstruct the exact token count; overlapping
windows match the closed-form window count). Run ALONE."""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from syslog_ng_spark.session import get_spark

N = 10_000_000


def main():
    spark = get_spark(cpus=32)
    d = spark.range(N).withColumnRenamed("id", "doc_id")

    def line(seed):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("doc_id") * 37 + i * 101 + seed), F.lit(5000)),
                ),
            ),
            " ",
        )

    # 32 tokens/doc, 4 lines — same shape as the curation corpus
    text = F.concat_ws(" ", line(1), line(2), line(3), line(4))
    path = "/tmp/scale_chunk/docs"
    d.select("doc_id", text.alias("text")).repartition(128).write.mode(
        "overwrite"
    ).parquet(path)
    docs = spark.read.parquet(path)

    from syslog_ng_spark.operators.packing import chunk_documents

    # disjoint: token-count reconstruction is exact
    t0 = time.time()
    agg = (
        chunk_documents(docs, chunk_tokens=12)
        .agg(
            F.count("*").alias("chunks"),
            F.sum("n_tokens").alias("toks"),
        )
        .collect()[0]
    )
    w1 = time.time() - t0
    assert agg["toks"] == 32 * N, agg
    assert agg["chunks"] == 3 * N, agg  # ceil(32/12) = 3 windows/doc
    print(f"disjoint 12-tok: {w1:.1f}s = {N/w1:,.0f} docs/s {dict(agg.asDict())}")

    # overlapping: closed-form window count = ceil((n-1)/stride)+1 ... = 1+floor((32-1)/8)=4
    t0 = time.time()
    n2 = chunk_documents(docs, chunk_tokens=16, stride=8).count()
    w2 = time.time() - t0
    assert n2 == 4 * N, n2
    print(f"overlap 16/8: {w2:.1f}s = {N/w2:,.0f} docs/s chunks={n2:,}")


if __name__ == "__main__":
    main()
