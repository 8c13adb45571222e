"""Corpus generator invariants (FIXTURES.md F1/F2)."""

from pyspark.sql import functions as F

from syslog_ng_spark.datagen import transcripts


def test_schema_and_determinism(spark):
    a = transcripts(spark, n_convs=30, avg_turns=5)
    assert a.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )
    b = transcripts(spark, n_convs=30, avg_turns=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dense_turn_idx_and_monotone_ts(spark):
    df = transcripts(spark, n_convs=40, avg_turns=6)
    per_conv = (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("turn_idx").alias("mx"),
            F.min("turn_idx").alias("mn"),
            (
                F.size(
                    F.filter(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("turn_idx", "ts"))
                            ),
                            lambda s: s["ts"].cast("long"),
                        ),
                        lambda t: t.isNotNull(),
                    )
                )
            ).alias("nts"),
        )
        .collect()
    )
    for r in per_conv:
        assert r.mn == 0 and r.mx == r.n - 1  # dense turn_idx

    # strict per-conv monotonicity of ts in turn order
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    bad = df.withColumn("prev", F.lag("ts").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev"))
    )
    assert bad.count() == 0


def test_hot_conversations_skew(spark):
    df = transcripts(spark, n_convs=100, avg_turns=5, hot_convs=2, hot_factor=100)
    sizes = {r.conv_id: r.n for r in df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    assert sizes["conv-00000000"] == 500
    assert sizes["conv-00000001"] == 500
    assert max(v for k, v in sizes.items() if k not in ("conv-00000000", "conv-00000001")) < 20


def test_dialect_mix(spark):
    df = transcripts(spark, n_convs=300, avg_turns=8)
    n = df.count()
    syslogish = df.filter(F.col("text").rlike(r"^<\d+>")).count()
    kv = df.filter(F.col("text").startswith("event=")).count()
    js = df.filter(F.col("text").startswith("{")).count()
    assert syslogish > n * 0.25
    assert kv > n * 0.1
    assert js > n * 0.05
