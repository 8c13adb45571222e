"""Port of modules/cef/tests/test-format-cef-extension.c — subkeys
selection, CEF escaping, key validation, on-error modes. The invalid
UTF-8 byte cases (\\xff keys/values) cannot arise in Spark strings and
are intentionally not ported."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.functions.templates import compile_template


def _cef(spark, nv, tmpl="$(format-cef-extension --subkeys .cef.)"):
    df = spark.createDataFrame([(1,)], "id long")
    df = df.withColumn(
        "nv",
        F.create_map(*[F.lit(x) for kv in nv.items() for x in kv]).cast(
            "map<string,string>"
        )
        if nv
        else F.create_map().cast("map<string,string>"),
    )
    return df.withColumn("out", compile_template(tmpl, {"id", "nv"})).head()["out"]


def test_filter(spark):
    assert _cef(spark, {".cef.k": "v", "x": "w"}) == "k=v"


def test_multiple_properties_with_space(spark):
    got = _cef(
        spark, {".cef.act": "c:/program files", ".cef.dst": "10.0.0.1"}
    )
    assert got == "act=c:/program files dst=10.0.0.1"


def test_multiple_properties(spark):
    assert _cef(spark, {".cef.k": "v", ".cef.x": "y"}) == "k=v x=y"


def test_drop_property(spark):
    got = _cef(
        spark,
        {".cef.a|b": "c", ".cef.kkk": "v", ".cef.x=y": "w"},
        "$(format-cef-extension --subkeys .cef. --on-error drop-property)",
    )
    assert got == "kkk=v"


def test_drop_message(spark):
    got = _cef(spark, {".cef.a|b": "c", ".cef.kkk": "v", ".cef.x=y": "w"})
    assert got == ""


def test_empty(spark):
    assert _cef(spark, {}) == ""


def test_inline(spark):
    got = _cef(spark, {}, "$(format-cef-extension --subkeys .cef. .cef.k=v)")
    assert got == "k=v"


def test_space(spark):
    assert _cef(spark, {".cef.act": "blocked a ping"}) == "act=blocked a ping"


def test_charset_value_utf8_ok(spark):
    assert (
        _cef(spark, {".cef.k": "árvíztűrőtükörfúrógép"})
        == "k=árvíztűrőtükörfúrógép"
    )


def test_charset_nonascii_key_drops_message(spark):
    assert _cef(spark, {".cef.árvíztűrőtükörfúrógép": "v"}) == ""


@pytest.mark.parametrize(
    "value,expected",
    [
        ("\\", "act=\\\\"),
        ("\\\\", "act=\\\\\\\\"),
        ("=", "act=\\="),
        ("|", "act=|"),
        ("\t", "act=\\u0009"),
        ("\n", "act=\\n"),
        ("\r", "act=\\r"),
        ("v\n", "act=v\\n"),
        ("v\r", "act=v\\r"),
        ("u\nv", "act=u\\nv"),
        ("\r\n", "act=\\r\\n"),
        ("\n\r", "act=\\n\\r"),
        ("this is a long value = something",
         "act=this is a long value \\= something"),
    ],
)
def test_escaping(spark, value, expected):
    assert _cef(spark, {".cef.act": value}) == expected


@pytest.mark.parametrize(
    "key", [".cef.k=w", ".cef.k|w", ".cef.k\\w", ".cef.k\nw", ".cef.k w"]
)
def test_bad_keys_drop_message(spark, key):
    assert _cef(spark, {key: "v"}) == ""


def test_prefix_variants(spark):
    assert _cef(spark, {"..k": "v"},
                "$(format-cef-extension --subkeys ..)") == "k=v"
    assert _cef(spark, {",k": "v"},
                "$(format-cef-extension --subkeys ,)") == "k=v"
    assert _cef(spark, {"k": "v"},
                "$(format-cef-extension --subkeys .cef.)") == ""
    assert _cef(spark, {" k": "v"},
                "$(format-cef-extension --subkeys ' ')") == "k=v"
    assert _cef(spark, {" k": "v"},
                '$(format-cef-extension --subkeys " ")') == "k=v"


def test_inline_pair_without_subkeys(spark):
    assert _cef(spark, {"k": "v"}, "$(format-cef-extension x=y)") == "x=y"
    assert _cef(spark, {"k": "v"}, "$(format-cef-extension)") == ""


def test_subkeys_argument_errors():
    with pytest.raises(ValueError):
        compile_template("$(format-cef-extension --subkeys)")
    with pytest.raises(ValueError):
        compile_template("$(format-cef-extension --subkeys '')")
    with pytest.raises(ValueError):
        compile_template('$(format-cef-extension --subkeys "")')
