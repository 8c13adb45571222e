"""Parser tests mirroring the reference scanner/parser suites
(lib/scanner/csv-scanner/tests, kv-scanner/tests, modules/syslogformat,
modules/regexp-parser, modules/timestamp, group-lines)."""

import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators import parsers


def _df(spark, lines):
    ts = datetime.datetime(2026, 2, 11, 12, 0, 0)
    return spark.createDataFrame(
        [("c1", i, t, ts) for i, t in enumerate(lines)],
        "conv_id string, turn_idx int, text string, ts timestamp",
    )


def test_syslog_rfc3164(spark):
    df = _df(spark, ["<38>Feb 11 21:27:22 bzorp openssh[1234]: Accepted publickey for user"])
    row = parsers.syslog_parser(df).collect()[0]
    assert row.pri == 38
    assert row.host == "bzorp"
    assert row.program == "openssh"
    assert row.pid == 1234
    assert row.msg == "Accepted publickey for user"
    assert row.syslog_format == "rfc3164"
    assert row.syslog_ts == datetime.datetime(2026, 2, 11, 21, 27, 22)
    assert row.syslog_tags == []


def test_syslog_rfc3164_missing_parts(spark):
    # missing PRI → default 13 + tag; missing hostname tag
    df = _df(spark, ["Feb 11 21:27:22 program: hello"])
    row = parsers.syslog_parser(df).collect()[0]
    assert row.syslog_matched
    assert row.pri == 13
    assert "syslog.missing_pri" in row.syslog_tags
    assert "syslog.missing_hostname" in row.syslog_tags
    assert row.program == "program"


def test_syslog_rfc5424(spark):
    line = '<165>1 2026-08-16T12:00:00.003+02:00 host app 1234 ID47 [ex@32473 k="v" n="x"] some msg'
    df = _df(spark, [line])
    row = parsers.syslog_parser(df).collect()[0]
    assert row.pri == 165
    assert row.host == "host"
    assert row.program == "app"
    assert row.pid == 1234
    assert row.msgid == "ID47"
    # reference naming: .SDATA.<sd-id>.<param>
    assert row.sdata == {".SDATA.ex@32473.k": "v", ".SDATA.ex@32473.n": "x"}
    assert row.msg == "some msg"
    assert row.syslog_format == "rfc5424"
    # 12:00:00.003+02:00 == 10:00:00.003 UTC
    assert row.syslog_ts == datetime.datetime(2026, 8, 16, 10, 0, 0, 3000)


def test_syslog_nonmatching(spark):
    df = _df(spark, ['{"json": 1}', "", "plain words only here"])
    rows = parsers.syslog_parser(df).collect()
    assert [r.syslog_matched for r in rows] == [False, False, False]


def test_csv_parser_quoted(spark):
    df = _df(spark, ['web-01,"nginx, Inc.",42,3.14,ok'])
    out = parsers.csv_parser(
        df, [("host", "string"), ("vendor", "string"), ("n", "int"), ("d", "double"), ("s", "string")]
    ).collect()[0]
    assert out.host == "web-01"
    assert out.vendor == "nginx, Inc."
    assert out.n == 42
    assert abs(out.d - 3.14) < 1e-9
    assert out.csv_matched


def test_csv_parser_dialects(spark):
    # semicolon delimiter + backslash escape
    df = _df(spark, [r'a;b\;c;d'])
    out = parsers.csv_parser(
        df, ["c1", "c2", "c3"], delimiter=";", escape="\\"
    ).collect()[0]
    assert (out.c1, out.c2, out.c3) == ("a", "b;c", "d")


def test_csv_greedy(spark):
    df = _df(spark, ["a,b,rest with, commas"])
    out = parsers.csv_parser(df, ["c1", "c2", "tail"], greedy=True).collect()[0]
    assert out.c1 == "a" and out.c2 == "b"
    assert out.tail == "rest with, commas"


def test_kv_parser(spark):
    df = _df(spark, ['k1=v1 k2="a b" k3=c, k4=\'q x\' empty= n=42'])
    out = parsers.kv_parser(df).collect()[0]
    assert out.kv["k1"] == "v1"
    assert out.kv["k2"] == "a b"
    assert out.kv["k3"] == "c"
    assert out.kv["k4"] == "q x"
    assert out.kv["empty"] == ""
    assert out.kv["n"] == "42"
    assert out.kv_matched


def test_kv_parser_prefix(spark):
    df = _df(spark, ["a=1 b=2"])
    out = parsers.kv_parser(df, prefix=".kv.").collect()[0]
    assert out.kv[".kv.a"] == "1"


def test_json_parser_flatten(spark):
    df = _df(spark, ['{"a": 1, "b": {"c": "x", "d": [1, 2]}, "e": true, "f": null}'])
    out = parsers.json_parser(df).collect()[0]
    assert out.json["a"] == "1"
    assert out.json["b.c"] == "x"
    # non-string arrays keep raw JSON (LM_VT_JSON); string arrays become
    # syslog-ng lists — json-parser.c typing
    assert out.json["b.d"] == "[1,2]"
    assert out.json["e"] == "true"
    assert out.json["f"] == ""
    assert out.json_matched


def test_json_parser_schema_and_marker(spark):
    df = _df(spark, ['@cim:{"k": 5}', '{"k": 6}'])
    out = parsers.json_parser(df, schema="k int", marker="@cim:").collect()
    assert out[0].json["k"] == 5
    assert not out[1].json_matched


def test_regexp_parser_named_groups(spark):
    df = _df(spark, ["error code=500 at /api/users", "warn code=404"])
    out = parsers.regexp_parser(
        df,
        [r"code=(?P<code>\d+) at (?P<path>\S+)", r"code=(?P<code>\d+)"],
    ).collect()
    assert out[0].code == "500" and out[0].path == "/api/users"
    assert out[1].code == "404" and out[1].path is None
    assert all(r.re_matched for r in out)


def test_regexp_parser_toplevel_alternation(spark):
    """'^a|b' anchors only the FIRST alternate: 'b' matches anywhere.
    The match-once packing must not re-anchor both alternates (which
    would leak the raw line as the group value while re_matched=True)."""
    df = _df(spark, ["apple pie", "xx berry", "cherry"])
    out = parsers.regexp_parser(df, r"^(?P<w>apple)|(?P<b>berry)").collect()
    assert out[0].w == "apple" and out[0].re_matched
    assert out[1].b == "berry" and out[1].re_matched  # matched mid-string
    assert not out[2].re_matched and out[2].w is None and out[2].b is None


def test_regexp_parser_sentinel_in_input(spark):
    """Control bytes in the input must never SHIFT group values: a row
    containing the packing sentinel sequence yields nulls (detectable),
    every other row parses normally; single-group patterns are immune."""
    sent = "\x1e\x1d\x1f"
    df = _df(spark, [f"k=a{sent}b v=2", "k=x v=9"])
    out = parsers.regexp_parser(df, r"k=(?P<k>\S+) v=(?P<v>\d+)").collect()
    assert out[1].k == "x" and out[1].v == "9"
    assert out[0].k is None and out[0].v is None  # nulled, not shifted
    one = parsers.regexp_parser(df, r"v=(?P<v>\d+)").collect()
    assert [r.v for r in one] == ["2", "9"]  # 1-group path: no sentinel at all


def test_date_parser(spark):
    df = _df(spark, ["2026-02-11 10:30:00", "11/Feb/2026 10:30:00"])
    out = parsers.date_parser(
        df, ["yyyy-MM-dd HH:mm:ss", "dd/MMM/yyyy HH:mm:ss"]
    ).collect()
    expected = datetime.datetime(2026, 2, 11, 10, 30)
    assert out[0].stamp == expected
    assert out[1].stamp == expected


def test_group_lines_indented(spark):
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "Traceback (most recent call last):", ts),
        ("c1", 1, "  File x.py line 1", ts),
        ("c1", 2, "  ValueError: boom", ts),
        ("c1", 3, "next record", ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    out = parsers.group_lines(df, key=["conv_id"], mode="indented").orderBy("turn_idx").collect()
    assert len(out) == 2
    assert out[0].text == "Traceback (most recent call last):\n  File x.py line 1\n  ValueError: boom"
    assert out[0].n_lines == 3
    assert out[1].text == "next record"


def test_syslog_parser_flags(spark):
    line3 = "<38>Feb 11 21:27:22 openssh[99]: hello"
    df = _df(spark, [line3])
    # no-parse: nothing parsed, whole text is msg
    row = parsers.syslog_parser(df, flags={"no-parse"}).collect()[0]
    assert row.msg == line3 and row.pri == 13 and row.syslog_matched
    # no-hostname: first token after date is the program
    row = parsers.syslog_parser(df, flags={"no-hostname"}).collect()[0]
    assert row.host is None and row.program == "openssh" and row.pid == 99
    # no-parse-date: stamp left null
    row = parsers.syslog_parser(df, flags={"no-parse-date"}).collect()[0]
    assert row.syslog_ts is None and row.pri == 38


def test_group_lines_smart(spark):
    # FSM semantics (smart-multi-line.fsm): java start needs
    # 'Exception:' (colon), frames need leading whitespace before 'at '
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "java.lang.NullPointerException: boom", ts),
        ("c1", 1, "\tat com.example.Foo.run(Foo.java:10)", ts),
        ("c1", 2, "Caused by: java.io.IOException", ts),
        ("c1", 3, "\t... 3 more", ts),
        ("c1", 4, "next log line", ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    out = parsers.group_lines(df, key=["conv_id"], mode="smart").orderBy("turn_idx").collect()
    assert len(out) == 2
    assert out[0].n_lines == 4
    assert out[1].text == "next log line"


def test_csv_greedy_quoted_head(spark):
    """Greedy tail must respect the quote dialect: a quoted head field
    containing the delimiter may not shift the split."""
    from syslog_ng_spark.operators.parsers import csv_parser

    df = spark.createDataFrame([('"x, y",rest, of it',)], "text string")
    out = csv_parser(df, ["a", "b"], greedy=True).collect()[0]
    assert out.a == "x, y"
    assert out.b == "rest, of it"


def test_kv_custom_pair_separator(spark):
    """pair_separator=';' keeps commas inside unquoted values."""
    from syslog_ng_spark.operators.parsers import kv_parser

    df = spark.createDataFrame([("a=1,2;b=3",)], "text string")
    out = kv_parser(df, pair_separator=";").collect()[0]
    assert out.kv == {"a": "1,2", "b": "3"}
    # default ', ' separator still splits on commas
    out2 = kv_parser(df.selectExpr("'a=1, b=2' AS text")).collect()[0]
    assert out2.kv == {"a": "1", "b": "2"}


KV_SCANNER_C_TABLE = [
    # (input, expected) — lib/scanner/kv-scanner/tests/test_kv_scanner.c
    ("foo=", {"foo": ""}),
    ("foo=bar", {"foo": "bar"}),
    ("foo=bar lorem ipsum key=value some more values",
     {"foo": "bar lorem ipsum", "key": "value some more values"}),
    ('foo="\\"" bar=baz', {"foo": '"', "bar": "baz"}),
    ("foo='\"' bar=baz", {"foo": '"', "bar": "baz"}),
    ('key1="\\"value1"', {"key1": '"value1'}),
    ('key1="\\b \\f \\n \\r \\t \\\\"', {"key1": "\b \f \n \r \t \\"}),
    ('key1="\\p"', {"key1": "\\p"}),          # unknown escape stays
    ("key1='\\'value1'", {"key1": "'value1"}),
    ("key1=\\b\\f\\n\\r\\t\\\\", {"key1": "\\b\\f\\n\\r\\t\\\\"}),  # unquoted: no decode
    ('foo=a "bar baz" ', {"foo": 'a "bar baz"'}),
    ('foo=a "bar baz c=d', {"foo": 'a "bar baz', "c": "d"}),
    ('foo=a "bar baz"=f c=d a', {"foo": 'a "bar baz"=f', "c": "d a"}),
    ("k=a=b c=d", {"k": "a=b", "c": "d"}),
    ("k=\t", {"k": "\t"}),
    ("k=,\t", {"k": ",\t"}),
    ("k=v,", {"k": "v,"}),
    ("k=v, ", {"k": "v"}),
    ("k===a=b", {"k": "==a=b"}),
    (":=v", {}),                              # restricted key charset
    ("*k=v", {"k": "v"}),
    ("foo =  bar ggg baz   =   ez", {"foo": "bar ggg", "baz": "ez"}),
    (" k= b", {"k": "b"}),
    ('k="a', {"k": '"a'}),                    # unterminated quote stays literal
    ("foo='bar", {"foo": "'bar"}),
]


def test_kv_scanner_c_table(spark):
    """kv-parser semantics pinned against the reference scanner's OWN
    test table (lib/scanner/kv-scanner/tests/test_kv_scanner.c): quoted
    C-string unescaping, embedded-space unquoted values that end only at
    the separator / next key / line end, trimmed separators, restricted
    key charset, unterminated-quote fallback."""
    from syslog_ng_spark.operators.parsers import kv_parser

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(KV_SCANNER_C_TABLE)], "i int, text string"
    )
    rows = kv_parser(df).orderBy("i").collect()
    for r, (inp, exp) in zip(rows, KV_SCANNER_C_TABLE):
        assert dict(r.kv or {}) == exp, f"input {inp!r}"


def test_kv_scanner_custom_separators(spark):
    """with_separators / pair_separator C cases: exact-string splitting,
    single-space separator disables the embedded-space heuristic, splunk
    'k|v' pairs joined by '='."""
    from syslog_ng_spark.operators.parsers import kv_parser

    cases = [
        ("foo=bar baz  ;bar=foo;", "=", ";", {"foo": "bar baz", "bar": "foo"}),
        ("foo=v1 v2 bar=v3 v4", "=", " ", {"foo": "v1", "bar": "v3"}),
        ("foo=v1 v2   bar=v3 v4  ", "=", "   ", {"foo": "v1 v2", "bar": "v3 v4"}),
        ("time|1557767758=action|Accept", "|", "=",
         {"time": "1557767758", "action": "Accept"}),
    ]
    for inp, vs, ps, exp in cases:
        df = spark.createDataFrame([(inp,)], "text string")
        got = dict(
            kv_parser(df, value_separator=vs, pair_separator=ps).collect()[0].kv
        )
        assert got == exp, f"input {inp!r} sep {ps!r}"


def test_syslog_format_c_cases(spark):
    """Port of modules/syslogformat/tests/test_syslog_format.c: cisco
    sequence id, invalid-PRI lax acceptance, missing-timestamp (host not
    expected without a timestamp), post-PRI space, check-program
    validation (alpha required, restricted charset)."""
    from syslog_ng_spark.operators.parsers import syslog_parser

    rows = [
        (0, "<189>65536: "),
        (1, "<189 Feb  3 12:34:56 host program[pid]: message"),
        (2, "<189> program[pid]: message"),
        (3, "<189> Feb  3 12:34:56 host "
            "program_0123456789-abcdefghijklmnopqrstuvwxyz"
            "(ABCDEFGHIJKLMNOPQRSTUVWXYZ).valid/chars[pid]: message"),
        (4, "<189> Feb  3 12:34:56 host 323235243.2354[pid]: message"),
        (5, "<189> Feb  3 12:34:56 host program![pid]: message"),
        (6, "<189> Feb  3 12:34:56 host 127.0.0.1[pid]: message"),
    ]
    import datetime

    ts = datetime.datetime(2026, 2, 3)
    df = spark.createDataFrame(
        [(i, t, ts) for i, t in rows], "i int, text string, ts timestamp"
    )
    out = {
        r.i: r
        for r in syslog_parser(
            df, require_header=False, flags={"check-program"}
        ).collect()
    }
    # cisco sequence id → SDATA, empty MSG
    assert out[0].sdata[".SDATA.meta.sequenceId"] == "65536"
    assert out[0].msg == ""
    assert out[0].pri == 189
    # malformed PRI: whole line is the MSG, tagged
    assert out[1].msg == rows[1][1]
    assert "syslog.invalid_pri" in out[1].syslog_tags
    assert out[1].program is None
    # no timestamp → no host, program still parses, missing-header tags
    assert out[2].host is None
    assert out[2].program == "program"
    assert out[2].msg == "message"
    assert "syslog.missing_timestamp" in out[2].syslog_tags
    assert "syslog.rfc3164_missing_header" in out[2].syslog_tags
    # valid program charset incl. ()./- passes check-program
    assert out[3].program == (
        "program_0123456789-abcdefghijklmnopqrstuvwxyz"
        "(ABCDEFGHIJKLMNOPQRSTUVWXYZ).valid/chars")
    assert out[3].host == "host"
    assert out[3].msg == "message"
    assert "syslog.rfc3164_invalid_program" not in out[3].syslog_tags
    # decimal-only / bad-char / IP programs fail check-program: program
    # unset, MSG keeps the raw tail, tag set
    for i, tail in [(4, "323235243.2354[pid]: message"),
                    (5, "program![pid]: message"),
                    (6, "127.0.0.1[pid]: message")]:
        assert out[i].program is None, i
        assert out[i].msg == tail, i
        assert "syslog.rfc3164_invalid_program" in out[i].syslog_tags, i
        assert out[i].host == "host", i


def test_csv_scanner_c_cases(spark):
    """Port of lib/scanner/csv-scanner/tests/test_csv_scanner.c: null
    value, partial input, greedy, doubled-quote escape, backslash
    dialects incl. \\xHH sequences with invalid-hex fallback."""
    from syslog_ng_spark.operators.parsers import csv_parser

    def parse(line, cols=3, **kw):
        df = spark.createDataFrame([(line,)], "text string")
        out = csv_parser(df, [f"c{i}" for i in range(cols)], **kw).collect()[0]
        return [out[f"c{i}"] for i in range(cols)]

    assert parse("val1,val2,val3") == ["val1", "val2", "val3"]
    assert parse("val1,null,val3", null_value="null") == ["val1", None, "val3"]
    assert parse("val1,val2") == ["val1", "val2", None]  # partial input
    assert parse("foo,bar,baz", cols=2, greedy=True) == ["foo", "bar,baz"]
    # escape-double-char: '""' inside quotes is a literal quote
    assert parse('foo,"this is a single quote "" character",x',
                 dialect="escape-double-char") == [
        "foo", 'this is a single quote " character', "x"]
    # escape-backslash: backslash keeps the next char literal
    assert parse('foo,"this is a single quote \\" character\\n",x',
                 dialect="escape-backslash") == [
        "foo", 'this is a single quote " charactern', "x"]
    # escape-backslash-with-sequences: C-string decode
    assert parse('foo,"\\"\\a\\t\\v\\r\\n\\"",x',
                 dialect="escape-backslash-with-sequences") == [
        "foo", '"\a\t\v\r\n"', "x"]
    assert parse('foo,"\\x41\\x2e\\x40",x',
                 dialect="escape-backslash-with-sequences") == [
        "foo", "A.@", "x"]
    # invalid hex escape: backslash dropped, rest literal
    assert parse('foo,"\\x4Q",x',
                 dialect="escape-backslash-with-sequences") == [
        "foo", "x4Q", "x"]
