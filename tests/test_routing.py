"""Routing semantics re-expressing the reference's logpath suite
(tests/light/functional_tests/logpath/test_flags_final.py,
test_flags_fallback.py, test_flags_catch_all.py, test_conditionals.py,
test_named_logpaths.py) with a pure-Python oracle over the same rows."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.plans import LogPath, Pipeline, if_else, junction


def _oracle(rows, paths):
    """Single-threaded reference evaluator of the mpx semantics
    (lib/logmpx.c:79-176): pass 1 normal branches with final consumption,
    pass 2 fallback branches."""
    out = {p.name: [] for p in paths}
    for row in rows:
        consumed = False
        matched_any = False
        for p in paths:
            if "catchall" in p.flags:
                # catch-all re-attaches to the source: immune to final
                # consumption, never sets matched (light
                # logpath/test_multiple_flags.py)
                if p.oracle(row):
                    out[p.name].append(row)
                continue
            if "fallback" in p.flags:
                continue
            if consumed:
                continue
            m = p.oracle(row)
            if m:
                matched_any = True
                out[p.name].append(row)
                if "final" in p.flags:
                    consumed = True
        if not matched_any:
            for p in paths:
                if "fallback" in p.flags and p.oracle(row):
                    out[p.name].append(row)
    return {k: len(v) for k, v in out.items()}


@pytest.fixture(scope="module")
def paths():
    a = LogPath("sink_a", F.col("role") == "assistant", frozenset(["final"]))
    b = LogPath("sink_b", F.col("tool") == "bash")
    c = LogPath("sink_c", None, frozenset(["fallback"]))
    d = LogPath("sink_d", None, frozenset(["catchall"]))
    a.oracle = lambda r: r.role == "assistant"
    b.oracle = lambda r: r.tool == "bash"
    c.oracle = lambda r: True
    d.oracle = lambda r: True
    return [a, b, c, d]


def test_flags_semantics_vs_oracle(transcripts_df, paths):
    routed = Pipeline(paths).route(transcripts_df, persist=True)
    try:
        got = {
            r.path: r.route_egress_total for r in routed.metrics().collect()
        }
        expected = _oracle(transcripts_df.collect(), paths)
        assert got == expected
        # sink() row counts agree with metrics egress
        for name in got:
            assert routed.sink(name).count() == got[name]
    finally:
        routed.unpersist()


def test_final_consumes(spark):
    df = spark.createDataFrame(
        [("assistant", "bash"), ("user", "bash"), ("user", "none")],
        "role string, tool string",
    )
    paths = [
        LogPath("first", F.col("role") == "assistant", frozenset(["final"])),
        LogPath("second", F.col("tool") == "bash"),
    ]
    routed = Pipeline(paths).route(df, persist=False)
    # row 1 consumed by first → second sees only rows 2,3 and matches row 2
    assert routed.sink("first").count() == 1
    assert routed.sink("second").count() == 1


def test_fallback_gets_unmatched_only(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "x string"
    )
    paths = [
        LogPath("p1", F.col("x") == "a"),
        LogPath("p2", F.col("x") == "b"),
        LogPath("fb", None, frozenset(["fallback"])),
    ]
    routed = Pipeline(paths).route(df, persist=False)
    rows = [r.x for r in routed.sink("fb").collect()]
    assert rows == ["c"]


def test_fallback_with_null_filter_result(spark):
    # NULL predicate (tool is NULL) must count as no-match, not leak rows
    df = spark.createDataFrame([("x", None)], "role string, tool string")
    paths = [
        LogPath("p1", F.col("tool") == "bash"),
        LogPath("fb", None, frozenset(["fallback"])),
    ]
    routed = Pipeline(paths).route(df, persist=False)
    assert routed.sink("p1").count() == 0
    assert routed.sink("fb").count() == 1


def test_per_branch_transform(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "x string, n int")
    paths = [
        LogPath(
            "t",
            None,
            transform=lambda d: d.withColumn("n2", F.col("n") * 2),
        )
    ]
    routed = Pipeline(paths).route(df, persist=False)
    assert [r.n2 for r in routed.sink("t").orderBy("n").collect()] == [2, 4]


def test_if_else(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "n int")
    out = if_else(
        df,
        F.col("n") == 1,
        lambda d: d.withColumn("branch", F.lit("then")),
        lambda d: d.withColumn("branch", F.lit("else")),
    )
    got = {(r.n, r.branch) for r in out.collect()}
    assert got == {(1, "then"), (2, "else"), (None, "else")}


def test_junction_rejoins(spark):
    df = spark.createDataFrame([(1,), (2,)], "n int")
    out = junction(
        df,
        [
            lambda d: d.filter("n = 1").withColumn("ch", F.lit("one")),
            lambda d: d.filter("n = 2").withColumn("ch", F.lit("two")),
        ],
    )
    assert out.count() == 2


def test_write_sinks_and_metrics(tmp_path, spark):
    df = spark.createDataFrame([("a",), ("b",)], "x string")
    paths = [LogPath("s1", F.col("x") == "a"), LogPath("s2", None)]
    routed = Pipeline(paths).route(df)
    try:
        dests = routed.write_sinks(str(tmp_path))
        assert spark.read.parquet(dests["s1"]).count() == 1
        assert spark.read.parquet(dests["s2"]).count() == 2
        m = {r.path: (r.route_ingress_total, r.route_egress_total) for r in routed.metrics().collect()}
        assert m == {"s1": (2, 1), "s2": (2, 2)}
    finally:
        routed.unpersist()


def test_write_metrics_table(tmp_path, spark):
    df = spark.createDataFrame([("a",), ("b",)], "x string")
    paths = [LogPath("s1", F.col("x") == "a"), LogPath("s2", None)]
    routed = Pipeline(paths).route(df, persist=False)
    dest = str(tmp_path / "metrics")
    routed.write_metrics(dest, run_id="r1")
    routed.write_metrics(dest, run_id="r2")  # appends per run (lineage)
    back = spark.read.parquet(dest)
    assert back.count() == 4
    assert {r.run_id for r in back.collect()} == {"r1", "r2"}


def test_text_equality_invariant_through_pipeline(transcripts_df):
    """North-rule invariant: per-turn `text` equality under stable
    (conv_id, turn_idx) ordering — parse/enrich/route must never touch
    the original text column."""
    from syslog_ng_spark.operators.parsers import kv_parser, syslog_parser

    parsed = kv_parser(syslog_parser(transcripts_df), source="msg")
    pipe = Pipeline(
        [
            LogPath("a", F.col("role") == "assistant", frozenset(["final"])),
            LogPath("rest", None, frozenset(["fallback"])),
        ]
    )
    routed = pipe.route(parsed, persist=True)
    try:
        src = {
            (r.conv_id, r.turn_idx): r.text for r in transcripts_df.collect()
        }
        seen = 0
        for name in ("a", "rest"):
            for r in routed.sink(name).select("conv_id", "turn_idx", "text").collect():
                assert src[(r.conv_id, r.turn_idx)] == r.text
                seen += 1
        assert seen == transcripts_df.count()  # every turn delivered once
    finally:
        routed.unpersist()
