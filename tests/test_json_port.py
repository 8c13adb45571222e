"""modules/json/tests/test_json_parser.c + test_dot_notation.c ported
table-driven against the schemaless flatten + dot-notation evaluator.

Documented divergences: the reference renders doubles through C "%f"
("1.230000") and echoes raw JSON number spellings ("1e6") — this engine
renders Python repr ("1.23") and canonical JSON ("1000000.0"); the
engine exposes values as one map column (typed LM_VT_* tags collapse to
the rendered string)."""

import pytest

from syslog_ng_spark.operators import parsers
from syslog_ng_spark.operators.parsers import (
    _compile_dot_notation,
    _dot_notation_eval,
    _DOT_MISS,
)


def _parse(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return parsers.json_parser(df, **kw).collect()[0]


def test_well_formed_json_into_values(spark):
    r = _parse(spark, '{"foo": "bar"}')
    assert r["json"]["foo"] == "bar" and r["json_matched"]


def test_prefix(spark):
    r = _parse(spark, '{"foo": "bar"}', prefix=".prefix.")
    assert r["json"][".prefix.foo"] == "bar"


def test_key_delimiter(spark):
    r = _parse(spark, '{"foo": "bar", "embed": {"foo": "bar"}}', key_delimiter="\t")
    assert r["json"]["foo"] == "bar"
    assert r["json"]["embed\tfoo"] == "bar"


def test_marker(spark):
    assert _parse(spark, '@cee: {"foo": "bar"}', marker="@cee:")["json"]["foo"] == "bar"
    assert not _parse(spark, '@cxx: {"foo": "bar"}', marker="@cee:")["json_matched"]


def test_invalid_json_fails(spark):
    assert not _parse(spark, "not-valid-json")["json_matched"]


def test_type_representation(spark):
    r = _parse(
        spark,
        '{"int": 123, "booltrue": true, "boolfalse": false, "double": 1.23,'
        ' "object": {"member1": "foo", "member2": "bar"},'
        ' "array": ["1", "2", "3"], "null": null}',
        prefix=".prefix.",
    )["json"]
    assert r[".prefix.int"] == "123"
    assert r[".prefix.booltrue"] == "true"
    assert r[".prefix.boolfalse"] == "false"
    assert r[".prefix.double"] == "1.23"  # reference: '1.230000' (%f)
    assert r[".prefix.object.member1"] == "foo"
    assert r[".prefix.object.member2"] == "bar"
    assert r[".prefix.array"] == "1,2,3"
    assert r[".prefix.null"] == ""


def test_array_typing(spark):
    r = _parse(
        spark,
        '{"intarray": [1, 2, 3],'
        ' "strarray": ["foo", "bar", "baz", "foo,bar,baz"],'
        ' "boolarray": [true,false,true],'
        ' "nullarray": [null,null,null,null],'
        ' "arrayofarrays": [[1,2],[3,4],[5,6]],'
        ' "arrayofmixedtypes": ["str",42,{},null],'
        ' "arrayofobjects": [{"foo":"bar"},{"foo":"bar"}]}',
        prefix=".prefix.",
    )["json"]
    assert r[".prefix.intarray"] == "[1,2,3]"
    # string arrays are syslog-ng LISTs with list-scanner quoting
    assert r[".prefix.strarray"] == 'foo,bar,baz,"foo,bar,baz"'
    assert r[".prefix.boolarray"] == "[true,false,true]"
    assert r[".prefix.nullarray"] == "[null,null,null,null]"
    assert r[".prefix.arrayofarrays"] == "[[1,2],[3,4],[5,6]]"
    assert r[".prefix.arrayofmixedtypes"] == '["str",42,{},null]'
    assert r[".prefix.arrayofobjects"] == '[{"foo":"bar"},{"foo":"bar"}]'


def test_int64_bounds(spark):
    assert _parse(spark, '{"int": 9223372036854775807}')["json"]["int"] == "9223372036854775807"
    assert _parse(spark, '{"int": -9223372036854775807}')["json"]["int"] == "-9223372036854775807"
    assert _parse(spark, '{"int": 1595441285858}')["json"]["int"] == "1595441285858"


def test_non_object_non_array_top_fails(spark):
    for bad in ("true", "null", "10"):
        assert not _parse(spark, bad)["json_matched"]


def test_extract_prefix_subobject(spark):
    r = _parse(spark, '[{"foo":"bar"}, {"bar":"foo"}]', extract_prefix="[0]")
    assert r["json"]["foo"] == "bar"


def test_top_level_array_into_match_slots(spark):
    r = _parse(spark, '[42,true,null,{"foo":"bar"}, {"bar":"foo"}]')["json"]
    assert "0" not in r  # $0 unset
    assert r["1"] == "42"
    assert r["2"] == "true"
    assert r["3"] == ""
    assert r["4"] == '{"foo":"bar"}'
    assert r["5"] == '{"bar":"foo"}'
    assert len(r) == 5


# --- dot-notation evaluator (test_dot_notation.c) --------------------------


def dn(input_obj, subscript):
    elems = _compile_dot_notation(subscript)
    if elems is None:
        return _DOT_MISS
    return _dot_notation_eval(input_obj, elems)


def test_dot_notation_empty_subscript_returns_object():
    assert dn({"foo": "bar"}, "") == {"foo": "bar"}


def test_dot_notation_member_refs():
    assert dn({"foo": "bar"}, "foo") == "bar"
    assert dn({"foo": {"foo": "bar"}}, "foo") == {"foo": "bar"}
    assert dn({"foo": {"foo": "bar"}}, "foo.foo") == "bar"
    assert dn({"foo": {"foo": {"foo": "bar"}}}, "foo.foo.foo") == "bar"
    assert dn({"fOo123_": "bar"}, "fOo123_") == "bar"


def test_dot_notation_odd_identifiers():
    for name in ("@foo", "_foo", "foo+4", "foo,bar", "foo bar", "foo-bar", "1"):
        assert dn({name: "bar"}, name) == "bar"


def test_dot_notation_eval_misses():
    assert dn({}, "123") is _DOT_MISS          # missing member
    assert dn({}, "foo123_?") is _DOT_MISS     # missing member (valid name)
    assert dn([1, 2, 3], "foo") is _DOT_MISS   # member of non-object
    assert dn({"foo": "bar"}, "[0]") is _DOT_MISS  # index of non-array


def test_dot_notation_compile_errors():
    assert _compile_dot_notation("foo[1]bar") is None
    assert _compile_dot_notation("foo[zbc]") is None
    assert _compile_dot_notation("foo.[0]") is None


def test_dot_notation_array_refs():
    assert dn(["foo", "bar", "baz"], "[0]") == "foo"
    assert dn(["foo", "bar", "baz"], "[1]") == "bar"
    assert dn({"foo": "bar", "baz": ["1", "2", "3"]}, "baz[2]") == "3"
    assert dn({"baz": [["1", "2", "3"], ["4", "5", "6"], ["7", "8", "9"]]},
              "baz[0][2]") == "3"
    assert dn(["foo", "bar", "baz"], "[3]") is _DOT_MISS
    assert _compile_dot_notation("[-1]") is None
