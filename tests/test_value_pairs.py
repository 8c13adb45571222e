"""value-pairs scope/glob/rekey tests mirroring lib/value-pairs tests."""

from pyspark.sql import functions as F

from syslog_ng_spark.functions.value_pairs import Rekey, map_value_pairs, value_pairs


def _df(spark):
    return spark.createDataFrame(
        [
            (
                "h1",
                "prog",
                7,
                38,
                "body",
                {"k1": "v1", ".dot.key": "dv", "k2": "v2"},
                {"sd1": "x"},
            )
        ],
        "host string, program string, pid int, pri int, text string, "
        "nv map<string,string>, sdata map<string,string>",
    )


def test_scopes(spark):
    df = _df(spark)
    # nv-pairs = non-dot nv entries + the builtins the reference stores
    # as NV values (test_value_pairs.c nv-pairs key set)
    vp = value_pairs(df, scopes=["nv-pairs"]).collect()[0].vp
    assert vp == {"k1": "v1", "k2": "v2", "HOST": "h1", "MESSAGE": "body",
                  "PID": "7", "PROGRAM": "prog"}
    vp = value_pairs(df, scopes=["dot-nv-pairs"]).collect()[0].vp
    # sdata entries are dot-NV in the reference's model -> merged in
    assert vp == {".dot.key": "dv", ".SDATA.sd1": "x"}
    # scope keys use the reference's macro-style names
    vp = value_pairs(df, scopes=["rfc3164"]).collect()[0].vp
    assert vp["HOST"] == "h1" and vp["PID"] == "7"
    assert vp["PRIORITY"] == "info" and vp["FACILITY"] == "auth"
    assert "DATE" not in vp  # frame has no ts column → DATE not evaluable
    vp = value_pairs(df, scopes=["sdata"]).collect()[0].vp
    assert vp == {".SDATA.sd1": "x"}


def test_include_exclude_globs(spark):
    df = _df(spark)
    vp = value_pairs(df, scopes=["nv-pairs"], include=["k*"], exclude=["k2"]).collect()[0].vp
    assert vp == {"k1": "v1"}


def test_include_glob_anchored_no_superstring(spark):
    """Glob 'k1' must not select superstring keys like 'xk1' or 'k1x'
    (reference value-pairs globs are full-string g_pattern_match)."""
    df = _df(spark).withColumn("xk1", F.lit("bad")).withColumn("k1x", F.lit("bad"))
    vp = value_pairs(df, scopes=["nv-pairs"], include=["k1"]).collect()[0].vp
    assert vp == {"k1": "v1"}
    # suffix glob does not match mid-string either: '*2' picks k2 only
    vp2 = value_pairs(df, scopes=["nv-pairs"], include=["*2"]).collect()[0].vp
    assert vp2 == {"k2": "v2"}


def test_explicit_pairs_and_rekey(spark):
    df = _df(spark)
    vp = value_pairs(
        df,
        scopes=["nv-pairs"],
        pairs={"custom": "$host/$program"},
        rekey=Rekey().add_prefix("out."),
    ).collect()[0].vp
    assert vp["out.custom"] == "h1/prog"
    assert vp["out.k1"] == "v1"


def test_rekey_transforms(spark):
    # (dot-nv-pairs now also carries the .SDATA.* entries — transforms
    # apply to the whole selection; assert via the .dot.key image)
    df = _df(spark)
    vp = value_pairs(
        df, scopes=["dot-nv-pairs"], rekey=Rekey().replace_prefix(".dot.", "d.")
    ).collect()[0].vp
    assert vp["d.key"] == "dv"
    vp2 = value_pairs(
        df, scopes=["dot-nv-pairs"], rekey=Rekey().shift(1)
    ).collect()[0].vp
    assert vp2["dot.key"] == "dv"
    vp3 = value_pairs(
        df, scopes=["dot-nv-pairs"], rekey=Rekey().shift_levels(2)
    ).collect()[0].vp
    assert vp3["key"] == "dv"


def test_map_value_pairs(spark):
    df = _df(spark)
    out = map_value_pairs(
        df, renames={"k1": "first"}, copies={"k2": "k2_copy"}
    ).collect()[0].nv
    assert out["first"] == "v1"
    assert "k1" not in out
    assert out["k2_copy"] == "v2" and out["k2"] == "v2"


# ---------------------------------------------------------------------------
# lib/value-pairs/tests/test_value_pairs.c ports: scope key sets +
# glob-scoped transformer sets. Transport wire macros the reference lists
# under 'everything' (DESTIP/PEERIP/...) resolve to ctx defaults here.
# ---------------------------------------------------------------------------

import datetime

import pytest


def _msg_df(spark):
    """The C suite's create_message() analogue: a 5424-shaped message
    with SDATA, pid, msgid and an event time."""
    return spark.createDataFrame(
        [(
            "bzorp", "syslog-ng", 23323, 134, "árvíztűrőtükörfúrógép",
            "ID47", datetime.datetime(2006, 2, 11, 10, 34, 56),
            {".SDATA.meta.sequenceId": "1001", ".SDATA.meta.sysUpTime": "10",
             ".SDATA.origin.ip": "1.2.3.4"},
            {"plain": "v"},
        )],
        "host string, program string, pid int, pri int, text string, "
        "msgid string, ts timestamp, sdata map<string,string>, nv map<string,string>",
    )


def _keys(spark, scope, exclude=None, pairs=None, rekey=None):
    df = _msg_df(spark)
    vp = value_pairs(
        df, scopes=[scope], exclude=exclude, pairs=pairs, rekey=rekey
    ).collect()[0].vp
    return vp


def test_vp_scope_key_sets(spark):
    base = {"DATE", "FACILITY", "HOST", "MESSAGE", "PID", "PRIORITY", "PROGRAM"}
    for scope in ("rfc3164", "core", "base"):
        assert set(_keys(spark, scope)) == base, scope
    sd = {".SDATA.meta.sequenceId", ".SDATA.meta.sysUpTime", ".SDATA.origin.ip"}
    for scope in ("rfc5424", "syslog-proto"):
        assert set(_keys(spark, scope)) == base | {"MSGID"} | sd, scope
    assert set(_keys(spark, "selected-macros")) >= base | {"SEQNUM", "SOURCEIP"}
    nv = {"HOST", "MESSAGE", "MSGID", "PID", "PROGRAM", "plain"}
    assert set(_keys(spark, "nv-pairs")) == nv
    assert set(_keys(spark, "dot-nv-pairs")) == sd
    assert set(_keys(spark, "sdata")) == sd
    assert set(_keys(spark, "all-nv-pairs")) == nv | sd
    everything = set(_keys(spark, "everything"))
    # the C list intersected with this engine's macro registry: all the
    # date families, pri family, message fields, transport defaults
    for probe in ("R_ISODATE", "S_UNIXTIME", "C_YEAR", "P_MONTH_NAME",
                  "BSDTAG", "TAG", "FACILITY_NUM", "SEVERITY_NUM", "MSGHDR",
                  "SOURCEIP", "PEERIP", "LOGHOST", "HOSTID", "RAWMSG_SIZE",
                  ".SDATA.origin.ip", "plain"):
        assert probe in everything, probe


def test_vp_scope_values(spark):
    vp = _keys(spark, "rfc3164")
    assert vp["HOST"] == "bzorp"
    assert vp["PROGRAM"] == "syslog-ng"
    assert vp["PID"] == "23323"
    assert vp["PRIORITY"] == "info"      # 134 % 8 = 6
    assert vp["FACILITY"] == "local0"


def test_vp_exclude_does_not_affect_explicit_pairs(spark):
    # C case: exclude 'test.*' while adding pair test.key
    vp = _keys(spark, "rfc3164", exclude=["test.*"], pairs={"test.key": "$MESSAGE"})
    assert vp["test.key"] == "árvíztűrőtükörfúrógép"
    # and excluding a default-set key removes it
    vp2 = _keys(spark, "nv-pairs", exclude=["MESSAGE"])
    assert "MESSAGE" not in vp2 and "HOST" in vp2


def test_vp_transformer_set_with_key_glob(spark):
    """test_transformer_shift_levels: the transform chain applies only
    to keys matching the set's glob, matched ONCE on the incoming key."""
    rk = (Rekey(key_glob=".SDATA.meta.*")
          .shift_levels(1).add_prefix(".foo.bar.baz.").shift_levels(4))
    vp = _keys(spark, "sdata", rekey=rk)
    assert set(vp) == {".SDATA.origin.ip", "SDATA.meta.sequenceId",
                       "SDATA.meta.sysUpTime"}


def test_vp_transformer_upper_lower(spark):
    vp = _keys(spark, "sdata", rekey=Rekey(key_glob=".SDATA.meta.sequenceId").lower())
    assert ".sdata.meta.sequenceid" in vp and ".SDATA.origin.ip" in vp
    vp2 = _keys(spark, "sdata", rekey=Rekey(key_glob=".SDATA.meta.sequenceId").upper())
    assert ".SDATA.META.SEQUENCEID" in vp2 and ".SDATA.meta.sysUpTime" in vp2


def test_vp_everything_transform_chain(spark):
    """test_transformers: add-prefix('__') + shift(2) + replace-prefix
    C_→CC_ over everything — net effect renames only the C_* family."""
    rk = Rekey().add_prefix("__").shift(2).replace_prefix("C_", "CC_")
    vp = _keys(spark, "everything", rekey=rk)
    assert "CC_YEAR" in vp and "C_YEAR" not in vp
    assert "HOST" in vp and "R_ISODATE" in vp  # others unchanged
