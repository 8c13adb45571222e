"""Ports of reference light-suite logpath cases
(tests/light/functional_tests/logpath/test_conditionals.py,
test_named_logpaths.py): if/else branch delivery, branch-drop →
fallback propagation, per-path counters re-read as an internal source."""

from pyspark.sql import functions as F

from syslog_ng_spark.plans import LogPath, Pipeline
from syslog_ng_spark.plans.pipeline import if_else, junction


def _one_msg(spark, msg="foobar"):
    return spark.createDataFrame([(msg,)], "text string")


def _counts(df_map):
    return {k: v.count() for k, v in df_map.items()}


def _run_if_path(spark, cond, then_filter=None):
    """Model of: log { source; if (cond) {[filter;] dest_true}
    else {dest_false}; dest_after } + a separate fallback path."""
    df = _one_msg(spark)
    sinks = {"dest_true": [], "dest_false": [], "dest_after": []}

    def then(d):
        if then_filter is not None:
            d = d.filter(then_filter)
        sinks["dest_true"].append(d)
        return d

    def otherwise(d):
        sinks["dest_false"].append(d)
        return d

    after = if_else(df, cond, then, otherwise)
    sinks["dest_after"].append(after)
    # flags(fallback) log path: gets rows NO normal path delivered —
    # delivery means reaching any destination of the main path
    delivered = after
    fallback = df.join(delivered, ["text"], "left_anti")
    return {k: v[0] for k, v in sinks.items()} | {"dest_fallback": fallback}


def test_simple_if(spark):
    out = _run_if_path(spark, F.lit("1") == "1")
    assert _counts(out) == {
        "dest_true": 1, "dest_false": 0, "dest_after": 1, "dest_fallback": 0,
    }
    assert out["dest_true"].collect()[0].text == "foobar"


def test_simple_if_negated(spark):
    out = _run_if_path(spark, F.lit("0") == "1")
    assert _counts(out) == {
        "dest_true": 0, "dest_false": 1, "dest_after": 1, "dest_fallback": 0,
    }


def test_if_that_drops_in_all_branches_falls_back(spark):
    """A filter inside the taken branch drops the message: no destination
    of the main path sees it, dest_after sees nothing, and the
    flags(fallback) path picks it up."""
    out = _run_if_path(spark, F.lit("1") == "1", then_filter=F.lit("0") == "1")
    assert _counts(out) == {
        "dest_true": 0, "dest_false": 0, "dest_after": 0, "dest_fallback": 1,
    }
    assert out["dest_fallback"].collect()[0].text == "foobar"


def test_junction_inside_path_rejoins_before_after_dest(spark):
    """junction { channel { filter A } channel { filter B } } followed by
    a shared destination: the after-destination sees the union of
    surviving branch rows exactly once per branch survival."""
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "text string, n int"
    )
    after = junction(
        df,
        [
            lambda d: d.filter(F.col("n") <= 2).withColumn("via", F.lit("low")),
            lambda d: d.filter(F.col("n") >= 3).withColumn("via", F.lit("high")),
        ],
    )
    got = sorted((r.text, r.via) for r in after.collect())
    assert got == [("a", "low"), ("b", "low"), ("c", "high")]


def test_named_path_counters_reread_as_internal_source(spark, tmp_path):
    """test_named_logpaths.py analogue: per-path ingress/egress counters
    are written as a table and re-read as a source (the internal()
    stats stream), then routed themselves."""
    df = spark.createDataFrame(
        [("error", 1), ("view", 2), ("error", 3)], "event_type string, n int"
    )
    pipe = Pipeline(
        [
            LogPath("p_err", F.col("event_type") == "error", frozenset(["final"])),
            LogPath("p_rest", None, frozenset(["fallback"])),
        ]
    )
    routed = pipe.route(df, persist=False)
    path = str(tmp_path / "internal_stats")
    routed.write_metrics(path, run_id="r1")
    # re-read as a source and run a pipeline over the counter stream
    internal = spark.read.parquet(path)
    got = {r.path: (r.route_ingress_total, r.route_egress_total) for r in internal.collect()}
    assert got == {"p_err": (3, 2), "p_rest": (1, 1)}
    meta = Pipeline([LogPath("nonzero", F.col("route_egress_total") > 0)])
    assert meta.route(internal, persist=False).sink("nonzero").count() == 2


def test_multiple_filters_implicit_and(spark):
    """filters/test_multiple_filters.py: a filter block with several
    statements ANDs them implicitly; the if/else splits the stream."""
    from syslog_ng_spark.plans.config import compile_config

    spec = {
        "filters": {
            "f_filter": [
                {"not": {"match": {"value": "program", "pattern": "xyz"}}},
                {"match": {"value": "text", "pattern": "MESSAGE"}},
            ],
        },
        "parsers": [],
        "rewrites": [],
        "paths": [
            {"name": "dest_true", "filter": "f_filter"},
            {"name": "dest_false", "flags": ["fallback"]},
        ],
    }
    cc = compile_config(spec)
    df = spark.createDataFrame(
        [("gen", "MESSAGE"), ("gen", "foobar")], "program string, text string"
    )
    routed = cc.route(df, persist=False)
    assert [r.text for r in routed.sink("dest_true").collect()] == ["MESSAGE"]
    assert [r.text for r in routed.sink("dest_false").collect()] == ["foobar"]


def test_multiple_flags_truth_table(spark):
    """Port of logpath/test_multiple_flags.py: final + plain + fallback
    paths in one log statement plus a catch-all path outside it — the
    4-message (host × program) truth table:
      host-A/app-A → dest1 only (final consumes it before dest2)
      host-A/app-B → dest1
      host-B/app-A → dest2
      host-B/app-B → dest3 (fallback — matched nowhere)
      all 4        → dest4 (catch-all re-attaches to the source)"""
    df = spark.createDataFrame(
        [("host-A", "app-A"), ("host-A", "app-B"),
         ("host-B", "app-A"), ("host-B", "app-B")],
        "host string, program string",
    )
    pipe = Pipeline(
        [
            LogPath("dest1", F.col("host") == "host-A", frozenset(["final"])),
            LogPath("dest2", F.col("program") == "app-A"),
            LogPath("dest3", None, frozenset(["fallback"])),
            LogPath("dest4", None, frozenset(["catchall"])),
        ]
    )
    routed = pipe.route(df)
    sink = lambda n: sorted(  # noqa: E731
        (r.host, r.program) for r in routed.sink(n).collect()
    )
    assert sink("dest1") == [("host-A", "app-A"), ("host-A", "app-B")]
    assert sink("dest2") == [("host-B", "app-A")]
    assert sink("dest3") == [("host-B", "app-B")]
    assert len(sink("dest4")) == 4  # catch-all sees every source row


def test_flags_catch_all_sees_consumed_rows(spark):
    """Port of logpath/test_flags_catch_all.py: a message delivered by a
    normal (even final) path STILL reaches the catch-all path — catchall
    re-attaches to the source, ignoring matching state."""
    df = spark.createDataFrame([("m1",), ("m2",)], "text string")
    pipe = Pipeline(
        [
            LogPath("d1", F.col("text") == "m1", frozenset(["final"])),
            LogPath("call", None, frozenset(["catchall"])),
        ]
    )
    routed = pipe.route(df)
    assert {r.text for r in routed.sink("d1").collect()} == {"m1"}
    assert {r.text for r in routed.sink("call").collect()} == {"m1", "m2"}


def test_multiple_embedded_logpaths_no_flags(spark):
    """Port of logpath/test_multiple_embedded_logpaths.py: embedded paths
    WITHOUT flags fan out independently — every message reaches every
    path whose filter matches (no final/fallback interaction), and a
    second top-level path sees everything."""
    df = spark.createDataFrame(
        [("host-A", "app-A"), ("host-A", "app-B"),
         ("host-B", "app-A"), ("host-B", "app-B")],
        "host string, program string",
    )
    pipe = Pipeline(
        [
            LogPath("dest1", F.col("host") == "host-A"),
            LogPath("dest2", F.col("program") == "app-A"),
            LogPath("dest3", None),
            LogPath("dest4", None, frozenset(["catchall"])),  # 2nd top-level log
        ]
    )
    routed = pipe.route(df)
    sink = lambda n: sorted(  # noqa: E731
        (r.host, r.program) for r in routed.sink(n).collect()
    )
    assert sink("dest1") == [("host-A", "app-A"), ("host-A", "app-B")]
    assert sink("dest2") == [("host-A", "app-A"), ("host-B", "app-A")]
    assert len(sink("dest3")) == 4
    assert len(sink("dest4")) == 4


def test_midpoint_destination_channel_filter_drops_only_inside(spark):
    """Port of logpath/test_midpoint_destinations.py's dest_dropall shape:
    a destination wrapped in channel { filter { false() } } receives
    nothing, while sibling destinations on the same path still deliver —
    per-branch transforms are isolated."""
    df = spark.createDataFrame([("foobar",)], "text string")
    pipe = Pipeline(
        [
            LogPath("dest_after", None),
            LogPath(
                "dest_dropall", None,
                transform=lambda d: d.filter(F.lit("0") == "1"),
            ),
        ]
    )
    routed = pipe.route(df)
    assert routed.sink("dest_after").count() == 1
    assert routed.sink("dest_dropall").count() == 0
