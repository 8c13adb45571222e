"""Port of lib/logmsg/tests/test_type_hints.c — hint parsing and the
reference cast semantics (type-hinting.c), as exercised through
compile_typed_template and $(format-json) pair hints."""

import json

import pytest

from syslog_ng_spark.functions.templates import (
    compile_template,
    compile_typed_template,
)


def _eval(spark, df_cols, tmpl, typed=True):
    df = spark.createDataFrame([tuple(df_cols.values())],
                               ", ".join(f"{k} string" for k in df_cols))
    fn = compile_typed_template if typed else compile_template
    return df.withColumn("out", fn(tmpl, set(df_cols))).head()["out"]


@pytest.mark.parametrize(
    "text,expected",
    [
        # test_bool_cast table (test_type_hints.c:108)
        ("True", True), ("true", True), ("1", True), ("totaly true", True),
        ("False", False), ("false", False), ("0", False),
        ("fatally false", False),
    ],
)
def test_bool_cast(spark, text, expected):
    assert _eval(spark, {"v": text}, "boolean($v)") is expected


def test_bool_cast_error_is_null(spark):
    # type_cast_to_boolean("booyah") → TYPE_HINTING_INVALID_CAST
    assert _eval(spark, {"v": "booyah"}, "boolean($v)") is None


@pytest.mark.parametrize(
    "text,expected",
    [
        # test_int32/int64_cast: decimal, hex, leading-zero DECIMAL
        ("12345", 12345), ("0x1000", 0x1000), ("0111", 111),
        ("-42", -42), ("+7", 7), ("-0x10", -16),
    ],
)
def test_int_cast(spark, text, expected):
    assert _eval(spark, {"v": text}, "int64($v)") == expected


@pytest.mark.parametrize("text", ["12345a", "", "0x", "1.5"])
def test_int_cast_error_is_null(spark, text):
    assert _eval(spark, {"v": text}, "int64($v)") is None


def test_double_cast(spark):
    assert _eval(spark, {"v": "1.5"}, "double($v)") == 1.5
    assert _eval(spark, {"v": "bogus"}, "double($v)") is None


def test_datetime_cast(spark):
    # "1699134067.123" → epoch seconds with fraction
    out = _eval(spark, {"v": "1699134067.123"}, "datetime($v)")
    assert out.timestamp() == pytest.approx(1699134067.123)


def test_format_json_hinted_pairs(spark):
    out = _eval(
        spark,
        {"v": "0x10", "jv": '{"x":1}'},
        '$(format-json n=int64($v) b=boolean(true) s=string(5) '
        'j=literal($jv) l=list("a,b"))',
        typed=False,
    )
    assert json.loads(out) == {
        "n": 16, "b": True, "s": "5", "j": {"x": 1}, "l": ["a", "b"],
    }
    assert '"5"' in out  # string() stays quoted
    assert '"16"' not in out  # int64() is a bare token


def test_format_json_unhinted_pair_stays_string(spark):
    # no hint → nv-model string (existing gate behavior preserved)
    out = _eval(spark, {"v": "10"}, "$(format-json k=$v)", typed=False)
    assert out == '{"k":"10"}'
