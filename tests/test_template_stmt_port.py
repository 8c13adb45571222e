"""Port of tests/light/functional_tests/templates/test_template_stmt.py
(+ the typed-value case) — named template statements, $(template ...)
static/dynamic/fallback binding (modules/basicfuncs/tf-template.c), and
syslog-ng 4 typed values rendering through $(format-json)."""

import json

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.functions.templates import (
    compile_template,
    compile_typed_template,
    register_named_template,
)
from syslog_ng_spark.operators import rewrite as RW


def _nv_df(spark, entries):
    df = spark.createDataFrame([(1,)], "id long")
    return df.withColumn(
        "nv",
        F.create_map(*[F.lit(x) for kv in entries.items() for x in kv]),
    )


def test_template_stmt_with_identifier_reference(spark):
    # create_template("template with $(format-welf test.*)") referenced
    # by name from a destination
    register_named_template(
        "t_welf", "template with $(format-welf test.*)", columns={"nv"}
    )
    df = _nv_df(spark, {"test.key1": "value1", "test.key2": "value2"})
    out = df.withColumn(
        "line", compile_template("$(template t_welf)", {"nv", "id"})
    ).head()["line"]
    assert out == "template with test.key1=value1 test.key2=value2"


def test_template_stmt_with_indirect_invocation(spark):
    # $(template ${template_fn} error resolving template) — dynamic
    # binding: the name comes from a message value at runtime
    register_named_template(
        "t_welf2", "template with $(format-welf test.*)", columns={"nv"}
    )
    df = _nv_df(
        spark, {"test.key1": "value1", "test.key2": "value2"}
    ).withColumn("template_fn", F.lit("t_welf2"))
    cols = {"nv", "id", "template_fn"}
    out = df.withColumn(
        "line",
        compile_template(
            "$(template ${template_fn} error resolving template)", cols
        ),
    ).head()["line"]
    assert out == "template with test.key1=value1 test.key2=value2"


def test_template_dynamic_fallback(spark):
    # lookup failure renders the remaining args joined by ' '
    # (tf_template_call → _append_args_with_separator)
    df = _nv_df(spark, {}).withColumn("template_fn", F.lit("no_such"))
    out = df.withColumn(
        "line",
        compile_template(
            "$(template ${template_fn} error resolving template)",
            {"nv", "id", "template_fn"},
        ),
    ).head()["line"]
    assert out == "error resolving template"


def test_template_static_unknown_is_compile_error(spark):
    # tf_template_prepare: a '$'-free unresolvable name errors at
    # compile time
    with pytest.raises(KeyError):
        compile_template("$(template never_registered_name)")


def test_template_with_non_string_values(spark):
    # set(int(10)) / set(float(4.5)) / set(10) / set(4.5) →
    # $(format-json values_*) renders JSON numbers, not strings
    df = spark.createDataFrame([(1,)], "id long")
    df = RW.set_value(df, "values_int_hint", "int(10)")
    df = RW.set_value(df, "values_float_hint", "float(4.5)")
    df = RW.set_value(df, "values_int_literal", "10")
    df = RW.set_value(df, "values_float_literal", "4.5")
    cols = set(df.columns)
    out = df.withColumn(
        "j", compile_template("$(format-json values_*)", cols)
    ).head()["j"]
    assert json.loads(out) == {
        "values_int_literal": 10,
        "values_int_hint": 10,
        "values_float_literal": 4.5,
        "values_float_hint": 4.5,
    }
    # the numbers must be BARE tokens, not quoted strings
    assert '"10"' not in out and '"4.5"' not in out


def test_typed_template_hints():
    assert compile_typed_template("string(10)") is not None
    # string() forces text: renders quoted through format-json


def test_format_json_string_stays_quoted(spark):
    df = spark.createDataFrame([(1, "10")], "id long, word string")
    out = df.withColumn(
        "j", compile_template("$(format-json word)", {"id", "word"})
    ).head()["j"]
    assert out == '{"word":"10"}'


def test_format_json_typed_column_and_bool(spark):
    df = spark.createDataFrame(
        [(7, 2.5, True, "x")], "n long, f double, b boolean, s string"
    )
    out = df.withColumn(
        "j", compile_template("$(format-json n f b s)", {"n", "f", "b", "s"})
    ).head()["j"]
    assert json.loads(out) == {"n": 7, "f": 2.5, "b": True, "s": "x"}


def test_format_json_glob_mixes_columns_and_nv(spark):
    df = _nv_df(spark, {"test.a": "1", "other": "z"}).withColumn(
        "test_col", F.lit(5)
    )
    out = df.withColumn(
        "j", compile_template("$(format-json test*)", {"nv", "id", "test_col"})
    ).head()["j"]
    assert json.loads(out) == {"test_col": 5, "test": {"a": "1"}}


def test_format_json_null_typed_omitted(spark):
    df = spark.createDataFrame([(1, None)], "id long, maybe string")
    out = df.withColumn(
        "j", compile_template("$(format-json maybe id)", {"id", "maybe"})
    ).head()["j"]
    assert json.loads(out) == {"id": 1}


def test_typed_set_with_condition_keeps_type(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = RW.set_value(df, "flagv", "int(9)", condition=F.col("id") == 1)
    rows = {r["id"]: r["flagv"] for r in out.collect()}
    assert rows == {1: 9, 2: None}
    assert dict(out.dtypes)["flagv"] == "bigint"
