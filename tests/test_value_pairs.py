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
    vp = value_pairs(df, scopes=["nv-pairs"]).collect()[0].vp
    assert vp == {"k1": "v1", "k2": "v2"}
    vp = value_pairs(df, scopes=["dot-nv-pairs"]).collect()[0].vp
    assert vp == {".dot.key": "dv"}
    vp = value_pairs(df, scopes=["rfc3164"]).collect()[0].vp
    assert vp["host"] == "h1" and vp["pid"] == "7"
    vp = value_pairs(df, scopes=["sdata"]).collect()[0].vp
    assert vp == {".SDATA.sd1": "x"}


def test_include_exclude_globs(spark):
    df = _df(spark)
    vp = value_pairs(df, scopes=["nv-pairs"], include=["k*"], exclude=["k2"]).collect()[0].vp
    assert vp == {"k1": "v1"}


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
    df = _df(spark)
    vp = value_pairs(
        df, scopes=["dot-nv-pairs"], rekey=Rekey().replace_prefix(".dot.", "d.")
    ).collect()[0].vp
    assert vp == {"d.key": "dv"}
    vp2 = value_pairs(
        df, scopes=["dot-nv-pairs"], rekey=Rekey().shift(1)
    ).collect()[0].vp
    assert vp2 == {"dot.key": "dv"}
    vp3 = value_pairs(
        df, scopes=["dot-nv-pairs"], rekey=Rekey().shift_levels(2)
    ).collect()[0].vp
    assert vp3 == {"key": "dv"}


def test_map_value_pairs(spark):
    df = _df(spark)
    out = map_value_pairs(
        df, renames={"k1": "first"}, copies={"k2": "k2_copy"}
    ).collect()[0].nv
    assert out["first"] == "v1"
    assert "k1" not in out
    assert out["k2_copy"] == "v2" and out["k2"] == "v2"
