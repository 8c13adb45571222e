"""grouping-by tests mirroring modules/correlation/tests/test_grouping_by.c
semantics (FIXTURES.md F5), plus salted-aggregation parity."""

import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators import grouping as G


def _df(spark):
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # conv A: turns at t=0,10,20 then a 120s gap, then t=140,150 → 2 sessions
    for i, off in enumerate([0, 10, 20, 140, 150]):
        rows.append(("A", i, "user" if i % 2 else "assistant", f"msg{i}", "bash",
                     base + datetime.timedelta(seconds=off), float(i)))
    # conv B: 2 turns incl. trigger text
    rows.append(("B", 0, "user", "hello", "none", base, 9.0))
    rows.append(("B", 1, "assistant", "session closed", "none",
                 base + datetime.timedelta(seconds=5), 1.0))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, duration double",
    )


def test_plain_grouping(spark):
    df = _df(spark)
    out = G.grouping_by(
        df,
        key=["conv_id"],
        aggregates={
            "n": G.context_length(),
            "roles": G.sorted_values("turn_idx", "role"),
            "dsum": F.sum("duration"),
            "dmin": F.min("duration"),
            "davg": F.avg("duration"),
        },
    )
    rows = {r.conv_id: r for r in out.collect()}
    assert rows["A"].n == 5
    assert rows["A"].roles == ["assistant", "user", "assistant", "user", "assistant"]
    assert rows["B"].dsum == 10.0
    assert rows["B"].dmin == 1.0
    assert rows["B"].davg == 5.0


def test_having_and_where(spark):
    df = _df(spark)
    out = G.grouping_by(
        df,
        key=["conv_id"],
        aggregates={"n": G.context_length()},
        where=F.col("role") == "user",
        having=F.col("n") >= 2,
    )
    rows = {r.conv_id: r.n for r in out.collect()}
    assert rows == {"A": 2}  # B has 1 user row → filtered by having


def test_timeout_sessions(spark):
    df = _df(spark)
    out = G.grouping_by(
        df,
        key=["conv_id"],
        aggregates={"n": G.context_length()},
        timeout=60,
    )
    per_conv = {}
    for r in out.collect():
        per_conv.setdefault(r.conv_id, []).append(r.n)
    assert sorted(per_conv["A"]) == [2, 3]  # 120s gap splits 5 turns → 3+2
    assert per_conv["B"] == [2]


def test_trigger_splits_context(spark):
    df = _df(spark)
    out = G.grouping_by(
        df,
        key=["conv_id"],
        aggregates={"n": G.context_length()},
        trigger=F.col("text").contains("session closed"),
    )
    rows = {(r.conv_id, r.n) for r in out.collect()}
    # B: trigger row is INCLUDED in its context → one context of 2
    assert ("B", 2) in rows
    assert ("A", 5) in rows


def test_context_lookup(spark):
    df = _df(spark)
    out = G.grouping_by(
        df,
        key=["conv_id"],
        aggregates={"user_msgs": G.context_lookup(F.col("role") == "user", "text")},
    )
    rows = {r.conv_id: sorted(r.user_msgs) for r in out.collect()}
    assert rows["A"] == ["msg1", "msg3"]
    assert rows["B"] == ["hello"]


def test_pass_through_inject(spark):
    df = _df(spark)
    out = G.grouping_by(
        df, key=["conv_id"], aggregates={"n": G.context_length()},
        inject_mode="pass-through",
    )
    assert out.count() == df.count() + 2  # originals + 2 synthetic rows


def test_salted_agg_matches_plain(spark, transcripts_df):
    plain = (
        transcripts_df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("turn_idx").alias("mx"),
            F.avg("turn_idx").alias("av"),
        )
    )
    salted = G.salted_agg(
        transcripts_df,
        key=["conv_id"],
        aggs={"n": ("count", None), "mx": ("max", "turn_idx"), "av": ("avg", "turn_idx")},
        salt_buckets=8,
    )
    p = {r.conv_id: (r.n, r.mx, round(r.av, 9)) for r in plain.collect()}
    s = {r.conv_id: (r.n, r.mx, round(r.av, 9)) for r in salted.collect()}
    assert p == s


def test_stats_and_metrics_probe(spark):
    df = _df(spark)
    st = G.stats_aggregate(df, ["conv_id"], "duration").collect()
    assert {r.conv_id for r in st} == {"A", "B"}
    mp = G.metrics_probe(df, ["role"]).collect()
    assert sum(r.value for r in mp) == df.count()


def test_salted_hll_count_distinct_matches_unsalted_sketch(spark, transcripts_df):
    from pyspark.sql import functions as F
    from syslog_ng_spark.operators.grouping import salted_agg

    got = {
        r.tool: r.nd
        for r in salted_agg(
            transcripts_df, ["tool"], {"nd": ("hll_count_distinct", "conv_id")}, salt_buckets=8
        ).collect()
    }
    want = {
        r.tool: r.nd
        for r in transcripts_df.groupBy("tool")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("conv_id")).alias("nd"))
        .collect()
    }
    assert got == want  # sketch union is lossless -> identical estimates


def test_salted_count_distinct_exact(spark, transcripts_df):
    from pyspark.sql import functions as F
    from syslog_ng_spark.operators.grouping import salted_count_distinct

    got = {
        r.tool: r.n_distinct
        for r in salted_count_distinct(transcripts_df, ["tool"], "conv_id").collect()
    }
    want = {
        r.tool: r.nd
        for r in transcripts_df.groupBy("tool")
        .agg(F.countDistinct("conv_id").alias("nd"))
        .collect()
    }
    assert got == want


def test_inject_mode_internal(spark, tmp_path):
    import datetime
    from syslog_ng_spark.operators.grouping import grouping_by, context_length

    t0 = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("u1", t0, 1.0), ("u1", t0, 2.0), ("u2", t0, 3.0)],
        "user string, ts timestamp, v double",
    )
    sink = str(tmp_path / "internal")
    out = grouping_by(
        df, ["user"], {"n": context_length()},
        inject_mode="internal", internal_sink=sink,
    )
    assert out.count() == 3  # originals flow on unchanged
    internal = spark.read.parquet(sink)
    rows = {r.user: (r.n, r.source) for r in internal.collect()}
    assert rows == {"u1": (2, "internal"), "u2": (1, "internal")}


def test_sessionize_chunked_equals_plain(spark):
    """The two-level (hot-key-parallel) sessionizer must induce exactly
    the same row partition as the single-window sessionize, including
    sessions spanning chunk boundaries and chains of merges."""
    import random
    import datetime

    from syslog_ng_spark.operators.grouping import sessionize, sessionize_chunked

    rng = random.Random(7)
    rows = []
    for k in ("a", "b"):
        t = 0.0
        for i in range(400):
            # gap mix: mostly short (in-session), sometimes > timeout,
            # sometimes exactly at the chunk boundary cadence
            t += rng.choice([5, 20, 50, 130, 3600 - (t % 3600) or 5])
            rows.append((k, i, datetime.datetime(2026, 3, 1) + datetime.timedelta(seconds=t)))
    df = spark.createDataFrame(rows, "k string, i int, ts timestamp")
    plain = sessionize(df, ["k"], timeout=120)
    chunked = sessionize_chunked(df, ["k"], timeout=120, chunk_seconds=600)

    def partition(out):
        got = {}
        for r in out.collect():
            got.setdefault((r.k, r.ctx_id), set()).add(r.i)
        # compare as a SET of groups: sorted() over frozensets uses the
        # subset partial order — ordering would depend on collect() row
        # order and flake
        return {frozenset(v) for v in got.values()}

    assert partition(plain) == partition(chunked)
