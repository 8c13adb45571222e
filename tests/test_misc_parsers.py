"""xml-parser / tags-parser / multi-source catchall / log-scheduler tests."""

import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators.parsers import tags_parser, xml_parser
from syslog_ng_spark.plans import LogPath, Pipeline, log_scheduler


def test_xml_parser(spark):
    df = spark.createDataFrame(
        [('<a attr="1"><b>hello</b><c>x</c></a>',), ("not xml",), (None,)],
        "text string",
    )
    rows = xml_parser(df).collect()
    assert rows[0].xml[".xml.a._attr"] == "1"
    assert rows[0].xml[".xml.a.b"] == "hello"
    assert rows[0].xml_matched
    assert not rows[1].xml_matched
    assert not rows[2].xml_matched


def test_tags_parser(spark):
    df = spark.createDataFrame(
        [("a, b ,c", ["pre"])], "text string, tags array<string>"
    )
    out = tags_parser(df).collect()[0]
    assert out.tags == ["pre", "a", "b", "c"]


def test_catchall_and_source_lists(spark):
    rows = [("s1", "x"), ("s2", "y"), ("s3", "z")]
    df = spark.createDataFrame(rows, "src string, v string")
    paths = [
        LogPath("only_s1", None, sources=("s1",)),
        LogPath("all", None, frozenset(["catchall"]), sources=("ignored",)),
        LogPath("fb", None, frozenset(["fallback"]), sources=("s3",)),
    ]
    routed = Pipeline(paths).route(df, persist=False, source_col="src")
    assert {r.v for r in routed.sink("only_s1").collect()} == {"x"}
    # catchall attaches to every source regardless of its own list
    assert routed.sink("all").count() == 3
    # catch-all delivery does NOT mark messages matched (light
    # logpath/test_multiple_flags.py): s3's row matched no normal
    # branch, so the s3-scoped fallback receives it
    assert [r.v for r in routed.sink("fb").collect()] == ["z"]


def test_fallback_scoped_to_its_source(spark):
    df = spark.createDataFrame([("s1", "x"), ("s3", "z")], "src string, v string")
    paths = [
        LogPath("p1", F.col("v") == "x", sources=("s1",)),
        LogPath("fb", None, frozenset(["fallback"]), sources=("s3",)),
    ]
    routed = Pipeline(paths).route(df, persist=False, source_col="src")
    assert [r.v for r in routed.sink("fb").collect()] == ["z"]


def test_log_scheduler_partitions(spark):
    df = spark.range(1000).withColumn("conv_id", F.concat(F.lit("c"), F.pmod("id", F.lit(3))))
    out = log_scheduler(df, "conv_id", 6)
    assert out.rdd.getNumPartitions() == 6
    salted = log_scheduler(df, "conv_id", 6, salt=4)
    assert salted.rdd.getNumPartitions() == 6
    # row counts preserved
    assert salted.count() == 1000


def test_scope_keys():
    from syslog_ng_spark.operators.grouping import scope_keys

    assert scope_keys("global") == []
    assert scope_keys("process") == ["host", "program", "pid"]


def test_write_sink_templated(spark, tmp_path):
    from syslog_ng_spark.sources.io import write_sink_templated

    df = spark.createDataFrame(
        [("web-01", "a"), ("db-01", "b")], "host string, text string"
    )
    dest = str(tmp_path / "out")
    write_sink_templated(df, dest, {"host_dir": "$host"})
    back = spark.read.parquet(dest)
    assert {r.host_dir for r in back.collect()} == {"web-01", "db-01"}
    import os

    assert os.path.isdir(f"{dest}/host_dir=web-01")


def test_group_lines_prefix_garbage_and_suffix(spark):
    """regexp-multi-line prefix-garbage / prefix-suffix: a garbage match
    closes the record (truncated at match start or end); the next line
    opens a new record even without a prefix."""
    import datetime
    from syslog_ng_spark.operators.parsers import group_lines

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("k", t0, 1, "BEGIN first"),
        ("k", t0, 2, "body line"),
        ("k", t0, 3, "tail END trailing junk"),
        ("k", t0, 4, "orphan after close"),
        ("k", t0, 5, "BEGIN second END"),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, turn_idx int, text string")
    got = {
        r.turn_idx: (r.text, r.n_lines)
        for r in group_lines(
            df, ["key"], mode="prefix-garbage",
            line_start_regex="^BEGIN", garbage_regex="END", separator="|",
        ).collect()
    }
    assert got[1] == ("BEGIN first|body line|tail ", 3)   # truncated at END start
    assert got[4] == ("orphan after close", 1)            # new record after close
    assert got[5] == ("BEGIN second ", 1)
    got2 = {
        r.turn_idx: r.text
        for r in group_lines(
            df, ["key"], mode="prefix-suffix",
            line_start_regex="^BEGIN", garbage_regex="END", separator="|",
        ).collect()
    }
    assert got2[1] == "BEGIN first|body line|tail END"    # suffix kept
    assert got2[5] == "BEGIN second END"
