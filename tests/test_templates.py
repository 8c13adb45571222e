"""Template/macro tests mirroring lib/template/tests (test_macro.c,
test_template.c) and modules/basicfuncs tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.functions.templates import compile_template
from syslog_ng_spark.functions.macros import macro


@pytest.fixture(scope="module")
def msg(spark):
    return spark.createDataFrame(
        [
            (
                "web-01",
                "sshd",
                1234,
                38,  # auth.info
                "Accepted publickey",
                datetime.datetime(2026, 2, 11, 21, 27, 22),
                ["t1", "t2"],
                {"k": "v", "n": "5"},
                ["whole", "g1", "g2"],
            )
        ],
        "host string, program string, pid int, pri int, text string, "
        "ts timestamp, tags array<string>, nv map<string,string>, matches array<string>",
    )


def _one(df, template):
    return df.select(compile_template(template, set(df.columns)).alias("out")).collect()[0].out


def test_literal_and_refs(msg):
    assert _one(msg, "plain") == "plain"
    assert _one(msg, "$HOST $PROGRAM[$PID]") == "web-01 sshd[1234]"
    assert _one(msg, "${host}-${program}") == "web-01-sshd"
    assert _one(msg, "$$HOST") == "$HOST"


def test_macros(msg):
    assert _one(msg, "$FACILITY.$SEVERITY") == "auth.info"
    assert _one(msg, "$LEVEL_NUM") == "6"
    assert _one(msg, "$YEAR-$MONTH-$DAY") == "2026-02-11"
    assert _one(msg, "$WEEKDAY") == "Wed"
    assert _one(msg, "$TAGS") == "t1,t2"
    assert _one(msg, "$MSGHDR") == "sshd[1234]: "
    assert _one(msg, "$DATE") == "Feb 11 21:27:22"


def test_nv_and_matches(msg):
    assert _one(msg, "${k}/${n}") == "v/5"
    assert _one(msg, "$1+$2") == "g1+g2"
    assert _one(msg, "$0") == "whole"


def test_string_funcs(msg):
    assert _one(msg, "$(lowercase $HOST)") == "web-01"
    assert _one(msg, "$(uppercase $PROGRAM)") == "SSHD"
    assert _one(msg, "$(length $HOST)") == "6"
    assert _one(msg, "$(substr $HOST 0 3)") == "web"
    assert _one(msg, "$(echo a b)") == "a b"
    assert _one(msg, "$(strip \"  x  \")") == "x"
    assert _one(msg, "$(sha1 x)") == "11f6ad8ec52a2984abaafd7c3b516503785c2072"


def test_numeric_funcs(msg):
    assert _one(msg, "$(+ 1 2)") == "3"
    assert _one(msg, "$(- $PID 234)") == "1000"
    assert _one(msg, "$(* 6 7)") == "42"
    assert _one(msg, "$(/ 7 2)") == "3"  # integer division like the reference
    assert _one(msg, "$(% 7 2)") == "1"
    assert _one(msg, "$(round 3.14159 2)") == "3.14"
    assert _one(msg, "$(+ 1.5 1)") == "2.5"


def test_list_funcs(msg):
    assert _one(msg, "$(list-head a,b,c)") == "a"
    assert _one(msg, "$(list-tail a,b,c)") == "b,c"
    assert _one(msg, "$(list-count a,b,c)") == "3"
    assert _one(msg, "$(list-nth 1 a,b,c)") == "b"
    assert _one(msg, "$(sum 1,2,3)") == "6"
    assert _one(msg, "$(max 1,9,3)") == "9"
    assert _one(msg, "$(average 2,4)") == "3"


def test_nested_calls(msg):
    assert _one(msg, "$(uppercase $(list-head a,b))") == "A"


def test_format_json_and_welf(msg):
    out = _one(msg, "$(format-json host=$HOST pid=$PID)")
    assert '"host":"web-01"' in out and '"pid":"1234"' in out
    assert _one(msg, "$(format-welf h=$HOST p=$PROGRAM)") == "h=web-01 p=sshd"


def test_macro_direct():
    c = macro("FACILITY_NUM")
    assert isinstance(c, F.Column)


def test_map_filter_iteration(msg):
    assert _one(msg, "$(map $(uppercase $_) a,b,c)") == "A,B,C"
    # keep elements longer than one char: (length - 1) is truthy when != 0
    assert _one(msg, "$(filter $(- $(length $_) 1) a,bb,ccc)") == "bb,ccc"


def test_format_cef_extension(msg):
    out = _one(msg, "$(format-cef-extension src=$HOST act=a=b)")
    assert out == r"src=web-01 act=a\=b"


def test_macro_table_reference_semantics(spark):
    """Table-driven check of macros.c formats (macros.c:236-530) for a
    fixed timestamp/pri, including the R_/S_/C_/P_ per-stamp families
    (all resolve to event time in batch — documented divergence)."""
    import datetime
    from syslog_ng_spark.functions.macros import macro, macro_names

    assert len(macro_names()) >= 170
    df = spark.createDataFrame(
        [(datetime.datetime(2026, 1, 5, 13, 7, 2), 134, "h1", "prog", 42,
          "hello", ["a"], "m1")],
        "ts timestamp, pri int, host string, program string, pid int, "
        "text string, tags array<string>, msgid string",
    )
    expect = {
        "DATE": "Jan  5 13:07:02",      # BSD space-padded day
        "FULLDATE": "2026 Jan 05 13:07:02",
        "ISODATE": "2026-01-05T13:07:02+00:00",
        "YEAR_DAY": "005",
        "MONTH_WEEK": "1",
        "HOUR12": "01",
        "AMPM": "PM",
        "WEEK_DAY": "2",                 # Monday, Sunday=1
        "WEEK_DAY_NAME": "Monday",
        "WEEK": "01",
        "ISOWEEK": "02",
        "BSDTAG": "6Q",                  # sev 6, facility 16 -> 'Q'
        "TAG": "86",                     # pri 134 = 0x86
        "FACILITY_NUM": 16,
        "SEVERITY_NUM": 6,
        "MSGHDR": "prog[42]: ",
        "R_ISODATE": "2026-01-05T13:07:02+00:00",
        "S_HOUR": "13",
        "C_UNIXTIME": "1767618422",
        "P_MONTH_NAME": "January",
    }
    row = df.select(*[macro(n).alias(f"m{i}") for i, n in enumerate(expect)]).collect()[0]
    for i, (name, want) in enumerate(expect.items()):
        assert row[f"m{i}"] == want, f"{name}: {row[f'm{i}']!r} != {want!r}"


def test_new_template_funcs(spark):
    """$(indent-multi-line) / $(binary) / $(names) / $(values) /
    $(list-search) / $(template) — the round-2 basicfuncs additions."""
    from syslog_ng_spark.functions.templates import (
        compile_template,
        register_named_template,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a\nb", "x,y,z")], "text string, lst string"
    ).withColumn("nv", F.create_map(F.lit("k2"), F.lit("v2"), F.lit("k1"), F.lit("v1")))
    register_named_template("t_hello", "hi $text")
    cases = {
        "$(indent-multi-line $text)": "a\n\tb",
        "$(binary 0x41 66 0x43)": "ABC",
        "$(names nv)": "k1,k2",
        "$(values nv)": "v2,v1",
        "$(list-search y $lst)": "1",
        "$(list-search q $lst)": "",
        "$(template t_hello)": "hi a\nb",
    }
    cols = {"text", "lst", "nv"}
    row = df.select(
        *[compile_template(t, cols).alias(f"c{i}") for i, t in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, want) in enumerate(cases.items()):
        assert row[f"c{i}"] == want, f"{tpl}: {row[f'c{i}']!r} != {want!r}"


def test_format_gelf(spark):
    """$(format-gelf) (scl/graylog2): GELF 1.1 JSON with numeric level /
    timestamp and '-' defaults, rendered from the engine's canonical
    columns through the macro layer (MSG->text, LEVEL_NUM->pri%8,
    R_UNIXTIME->ts)."""
    import datetime
    import json

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [("web1", "disk full", 27, datetime.datetime(2023, 11, 14, 22, 13, 20),
          "cron", 42)],
        "host string, text string, pri int, ts timestamp, program string, pid int",
    )
    out = df.select(compile_template("$(format-gelf)").alias("g")).collect()[0].g
    obj = json.loads(out)
    assert obj["version"] == "1.1"
    assert obj["host"] == "web1"
    assert obj["short_message"] == "disk full"
    assert obj["level"] == 3 and isinstance(obj["level"], int)  # 27 % 8
    assert obj["timestamp"] == 1700000000
    assert obj["_program"] == "cron" and obj["_pid"] == 42
    assert obj["_facility"] == "daemon"  # 27 // 8 = 3


def test_loggly_and_splunk_templates(spark):
    import datetime

    from syslog_ng_spark.functions.templates import loggly_line, splunk_hec_raw_line

    df = spark.createDataFrame(
        [(13, datetime.datetime(2026, 3, 1, 10, 20, 30), "web1", "myapp", 7,
          "-", "hello")],
        "pri int, ts timestamp, host string, program string, pid int, "
        "msgid string, text string",
    )
    got = df.select(loggly_line("TOKEN", "prod").alias("l")).collect()[0].l
    assert got == ('<13>1 2026-03-01T10:20:30+00:00 web1 myapp 7 - '
                   '[TOKEN@41058 tag="prod"] hello')
    got2 = df.select(splunk_hec_raw_line(
        "${ISODATE} ${HOST} ${PROGRAM}[${PID}]: ${MSG}").alias("s")).collect()[0].s
    assert got2 == "2026-03-01T10:20:30+00:00 web1 myapp[7]: hello"


def test_basicfuncs_c_table(spark):
    """Port of modules/basicfuncs/tests/test_basicfuncs.c string/numeric
    cases over the engine's template compiler (HOST=bzorp,
    PROGRAM=syslog-ng, PID=23323, FACILITY_NUM=19 fixture, like the C
    suite's default message)."""
    import datetime

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [("bzorp", "syslog-ng", 23323, 155, datetime.datetime(2026, 2, 11),
          "msg", "  value  ")],
        "host string, program string, pid int, pri int, ts timestamp, "
        "text string, strip1 string",
    )
    cases = [
        ("$(length $HOST $PID)", "5 5"),
        ("$(length $HOST)", "5"),
        ("$(substr $HOST 1 3)", "zor"),
        ("$(substr $HOST 1)", "zorp"),
        ("$(substr $HOST -1)", "p"),
        ("$(substr $HOST -2 1)", "r"),
        ("$(strip ${strip1})", "value"),
        ("$(sanitize alma/bela)", "alma_bela"),
        ("$(sanitize -r @ alma/bela)", "alma@bela"),
        ("$(sanitize -i @ alma@bela)", "alma_bela"),
        ("$(sanitize $HOST $PROGRAM)", "bzorp/syslog-ng"),
        ("$(lowercase ŐRÜLT ÍRÓ)", "őrült író"),
        ("$(uppercase őrült író)", "ŐRÜLT ÍRÓ"),
        ("$(padding foo 10)", "       foo"),
        ("$(padding foo 10 x)", "xxxxxxxfoo"),
        ("$(padding foo 10 abc)", "abcabcafoo"),
        ("$(padding foo 2)", "foo"),
        ("$(padding foo 3)", "foo"),
        ("$(padding foo 6 abc)", "abcfoo"),
        # FACILITY_NUM for pri 155 is 19 (the C fixture's value)
        ("$(+ $FACILITY_NUM 1)", "20"),
        ("$(+ -1 -1)", "-2"),
        ("$(- $FACILITY_NUM 1)", "18"),
        ("$(- $FACILITY_NUM 20)", "-1"),
        ("$(* $FACILITY_NUM 2)", "38"),
        ("$(/ $FACILITY_NUM 2)", "9"),
        ("$(% $FACILITY_NUM 3)", "1"),
        ("$(/ $FACILITY_NUM 0)", "NaN"),
        ("$(% $FACILITY_NUM 0)", "NaN"),
        ("$(+ foo bar)", "NaN"),
        ("$(/ 2147483648 1)", "2147483648"),
        ("$(+ 5000000000 5000000000)", "10000000000"),
        ("$(% 10000000000 5000000001)", "4999999999"),
        ("$(* 5000000000 2)", "10000000000"),
        ("$(- 10000000000 5000000000)", "5000000000"),
        ("$(/ 3 2)", "1"),  # both-int operands: int64 division
    ]
    sel = df.select(
        *[compile_template(t).alias(f"c{i}") for i, (t, _) in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, exp) in enumerate(cases):
        assert sel[f"c{i}"] == exp, f"{tpl!r}: {sel[f'c{i}']!r} != {exp!r}"


def test_basicfuncs_fname_and_round(spark):
    """test_basicfuncs.c fname + numeric edge cases: dirname of a bare
    name is '.', trailing-slash dirs, round precision bounds."""
    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame([("x",)], "dummy string")
    cases = [
        ("$(basename foo)", "foo"),
        ("$(basename /foo/bar)", "bar"),
        ("$(basename /foo/bar/baz)", "baz"),
        ("$(dirname foo)", "."),
        ("$(dirname /foo/bar)", "/foo"),
        ("$(dirname /foo/bar/)", "/foo/bar"),
        ("$(dirname /foo/bar/baz)", "/foo/bar"),
        ("$(round 2.0)", "2"),
        ("$(round 2.123456 3)", "2.123"),
        ("$(round 2.123456 4)", "2.1235"),
        ("$(round 0.5)", "1"),
        ("$(round 2 -1)", "NaN"),
        ("$(round 2 21)", "NaN"),
        ("$(round 2 0)", "2"),
        ("$(floor 0.7)", "0"),
        ("$(ceil 0.2)", "1"),
    ]
    row = df.select(
        *[compile_template(t).alias(f"c{i}") for i, (t, _) in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, exp) in enumerate(cases):
        assert row[f"c{i}"] == exp, f"{tpl!r}: {row[f'c{i}']!r} != {exp!r}"


def test_numeric_aggregates_skip_invalid(spark):
    """test_basicfuncs.c numeric-aggregate cases: invalid list elements
    are skipped; an all-invalid list renders ''; C 'average' is integer
    on integral results."""
    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [("1,-1,3", "abc,1,c,2,", "abc,c,")],
        "good string, mixed string, bad string",
    )
    cases = [
        ("$(sum ${good})", "3"), ("$(min ${good})", "-1"),
        ("$(max ${good})", "3"), ("$(average ${good})", "1"),
        ("$(sum ${mixed})", "3"), ("$(min ${mixed})", "1"),
        ("$(max ${mixed})", "2"), ("$(average ${mixed})", "1"),
        ("$(sum ${bad})", ""), ("$(min ${bad})", ""),
        ("$(max ${bad})", ""), ("$(average ${bad})", ""),
    ]
    row = df.select(
        *[compile_template(t).alias(f"c{i}") for i, (t, _) in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, exp) in enumerate(cases):
        got = row[f"c{i}"] or ""
        assert got == exp, f"{tpl!r}: {got!r} != {exp!r}"


def test_template_default_value_syntax(spark):
    """lib/template default-value syntax (test_template.c): ${NAME:-d}
    falls back when the name is unset or empty, and $$ escaping keeps
    composing with match refs."""
    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [({"APP.VALUE": "value", "APP.EMPTY": ""}, ["first-match"])],
        "nv map<string,string>, matches array<string>",
    )
    cases = [
        ("${APP.VALUE:-ures}", "value"),
        ("${APP.VALUE99:-ures}", "ures"),
        ("${APP.EMPTY:-ures}", "ures"),
        ("$$$0$$", "$first-match$"),
    ]
    row = df.select(
        *[compile_template(t).alias(f"c{i}") for i, (t, _) in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, exp) in enumerate(cases):
        assert row[f"c{i}"] == exp, f"{tpl!r}: {row[f'c{i}']!r} != {exp!r}"


def test_list_funcs_c_table(spark):
    """test_basicfuncs.c list cases over the list-scanner model: quoted
    elements keep commas/escapes, unquoted empties are skipped, append
    quotes elements containing specials."""
    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame([("bzorp", "syslog-ng", 23323)],
                               "host string, program string, pid int")
    cases = [
        ("$(list-concat)", ""),
        ("$(list-concat foo bar baz)", "foo,bar,baz"),
        ("$(list-concat foo bar baz '')", "foo,bar,baz"),
        ("$(list-concat foo $HOST $PROGRAM $PID bar)", "foo,bzorp,syslog-ng,23323,bar"),
        ("$(list-concat foo '$HOST,$PROGRAM,$PID,' bar)", "foo,bzorp,syslog-ng,23323,bar"),
        ("$(list-append '' foo)", "foo"),
        ("$(list-append '' foo bar)", "foo,bar"),
        ("$(list-append foo,bar,baz 'x')", "foo,bar,baz,x"),
        ("$(list-append foo,bar,baz '')", 'foo,bar,baz,""'),
        ("$(list-append foo,bar,baz 'xxx,')", 'foo,bar,baz,"xxx,"'),
        ("$(list-head)", ""),
        ("$(list-head '')", ""),
        ("$(list-head foo,)", "foo"),
        ("$(list-head ,bar,baz)", "bar"),
        ("$(list-head foo bar)", "foo"),
        ("$(list-head '' bar baz)", "bar"),
        ('$(list-head \'"\\tfoo,",bar,baz\')', "\tfoo,"),
        ('$(list-nth 0 \'"foo,","bar","baz"\')', "foo,"),
        ('$(list-nth 1 \'"foo,","bar","baz"\')', "bar"),
        ('$(list-nth 3 \'"foo,","bar","baz"\')', ""),
        ("$(list-count foo,bar,baz)", "3"),
        ("$(list-count ,bar,baz)", "2"),
        ("$(list-tail foo,bar,baz)", "bar,baz"),
    ]
    row = df.select(
        *[compile_template(t).alias(f"c{i}") for i, (t, _) in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, exp) in enumerate(cases):
        got = row[f"c{i}"] or ""
        assert got == exp, f"{tpl!r}: {got!r} != {exp!r}"


def test_format_date_c_cases(spark):
    """test_format_date.c: epoch values, message-stamp default, and
    --time-zone rendering (session TZ is UTC)."""
    import datetime

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [(datetime.datetime(2022, 11, 3, 19, 36, 53),)], "ts timestamp"
    )
    # NOTE: the C suite renders the un-zoned cases in the TEST HOST's
    # local zone (CET in the recorded expectations); this engine renders
    # in the session zone, pinned to UTC — epoch 1667500613 is
    # 18:36:53Z. The --time-zone case is zone-explicit and matches the
    # C expectation exactly.
    cases = [
        ("$(format-date %Y-%m-%dT%H:%M:%S)", "2022-11-03T19:36:53"),
        ("$(format-date %Y-%m-%dT%H:%M:%S 1667500613)", "2022-11-03T18:36:53"),
        ("$(format-date --time-zone PST8PDT %Y-%m-%dT%H:%M:%S 1667500613)",
         "2022-11-03T11:36:53"),
    ]
    row = df.select(
        *[compile_template(t).alias(f"c{i}") for i, (t, _) in enumerate(cases)]
    ).collect()[0]
    for i, (tpl, exp) in enumerate(cases):
        assert row[f"c{i}"] == exp, f"{tpl!r}: {row[f'c{i}']!r} != {exp!r}"


def test_format_json_c_cases(spark):
    """test_format_json.c shape (order-insensitive compare): nested
    dotted keys, leading-dot → '_', scopes, key globs, shift-levels +
    add-prefix, bare nv selections omitted when unset."""
    import json

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [("bzorp", "syslog-ng", 23323, "msgtext",
          {".program.@name": "syslog-ng", "plain": "v"})],
        "host string, program string, pid int, text string, nv map<string,string>",
    )
    colset = set(df.columns)

    def render(tpl):
        return json.loads(
            df.select(compile_template(tpl, colset).alias("j")).collect()[0].j
        )

    assert render("$(format-json MSG=$text)") == {"MSG": "msgtext"}
    assert render("$(format-json msg.text=$text msg.id=42 host=bzorp)") == {
        "msg": {"text": "msgtext", "id": "42"}, "host": "bzorp"}
    assert render("$(format-json .foo=bar)") == {"_foo": "bar"}
    assert render("$(format-json @program.123=${program})") == {
        "@program": {"123": "syslog-ng"}}
    assert render("$(format-json .program.@name=${program})") == {
        "_program": {"@name": "syslog-ng"}}
    # scope + key glob — scope keys use the reference's macro-style
    # names (HOST/PROGRAM/..., test_value_pairs.c key sets)
    got = render("$(format-json --scope rfc3164)")
    assert got["HOST"] == "bzorp" and got["PROGRAM"] == "syslog-ng"
    got2 = render("$(format-json --scope rfc3164 --key H*)")
    assert set(got2) == {"HOST"}
    # shift-levels + add-prefix over an nv selection
    got3 = render(
        "$(format-json .program.@name=${program} --key .program.* "
        "--shift-levels 2 --add-prefix _)")
    assert got3 == {"_@name": "syslog-ng"}
    # bare unset nv names are omitted
    assert render("$(format-json x=1 .program.foo)") == {"x": "1"}
    # bare names resolve builtin values like ${...} does (value-pairs
    # selects engine columns by name, not only nv entries)
    assert render("$(format-json host program plain)") == {
        "host": "bzorp", "program": "syslog-ng", "plain": "v"}


def test_format_cim(spark):
    """scl/cim/template.conf $(format-cim): @timestamp/@message pairs +
    .cim.* keys shifted to top level + leading-dot keys renamed '_',
    with per-glob transform binding (the --shift applies ONLY to the
    .cim.* selection, not to '_'/dotted keys selected by later globs)."""
    import datetime
    import json

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame(
        [(
            "auth failed",
            datetime.datetime(2026, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc),
            {".cim.action": "failure", ".cim.src": "1.2.3.4",
             "_private": "x", ".other.key": "y", "plain.dotted": "z"},
        )],
        "text string, ts timestamp, nv map<string,string>",
    )
    got = json.loads(
        df.select(
            compile_template("$(format-cim --scope dot-nv-pairs,nv-pairs)", set(df.columns)).alias("j")
        ).collect()[0]["j"]
    )
    assert got["@message"] == "auth failed"
    assert got["@timestamp"].startswith("2026-03-01T12:00:00")
    assert got["action"] == "failure"       # .cim.* shifted 5 chars
    assert got["src"] == "1.2.3.4"
    assert got["_private"] == "x"           # _* kept as-is
    assert got["_other"] == {"key": "y"}    # .* -> replace-prefix .=_
    assert got["plain"] == {"dotted": "z"}  # *.* kept, nested


def test_format_json_sequential_transform_sets(spark):
    """ADVICE r4: ALL --key transform sets apply sequentially, each
    re-matching its glob against the (possibly rewritten) key —
    vp_transform_apply loops every set, value_pairs_transform_set_apply
    re-tests the glob. A key rewritten by set 1 into set 2's glob gets
    set 2's transforms too."""
    import json

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame([("syslog-ng",)], "program string")
    colset = set(df.columns)

    def render(tpl):
        return json.loads(
            df.select(compile_template(tpl, colset).alias("j")).collect()[0].j
        )

    got = render(
        "$(format-json .program.name=${program} --key .program.* "
        "--shift-levels 2 --key name* --add-prefix x.)"
    )
    assert got == {"x": {"name": "syslog-ng"}}
    # a key matching BOTH sets gets both transforms (prefix applied twice)
    got2 = render(
        "$(format-json k=v --key k* --add-prefix a --key a* --add-prefix b)"
    )
    assert got2 == {"bak": "v"}


def test_format_json_shift_consumes_whole_key(spark):
    """--shift erases up to N chars like g_string_erase — consuming the
    entire key yields an EMPTY key, not the original (ADVICE r4)."""
    import json

    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame([("v",)], "c string")
    got = json.loads(
        df.select(
            compile_template("$(format-json abc=zz --key abc --shift 3)", {"c"}).alias("j")
        ).collect()[0].j
    )
    assert got == {"": "zz"}


def test_cryptofuncs_port(spark):
    """Port of modules/cryptofuncs/tests/test_cryptofuncs.c test_hash
    (md4 excluded: no JVM digest; the reference itself gates it behind
    an OpenSSL check). The ${missingbrace} compile-failure case is a
    lexer-level assertion with no analogue in this compiler."""
    import pytest as _pytest

    cases = {
        "$(sha1 foo)": "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33",
        "$(sha1 bar)": "62cdb7020ff920e5aa642c3d4066950dd1f01f4d",
        "$(md5 foo)": "acbd18db4cc2f85cedef654fccc4a4d8",
        "$(hash foo)":
            "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae",
        "$(sha256 foo)":
            "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae",
        "$(sha512 foo)":
            "f7fbba6e0636f890e56fbbf3283e524c6fa3204ae298382d624741d0dc66383"
            "26e282c41be5e4254d8820772c5518a2c5a8c0c7f7eda19594a7eb539453e1ed7",
        "$(sha1 --length 5 foo)": "0beec",
        "$(sha1 -l 5 foo)": "0beec",
        "$(sha1 --length 99999 foo)":
            "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33",
        "$(sha1 foo bar)": "8843d7f92416211de9ebb963ff4ce28125932878",
        '$(sha1 "foo bar")': "3773dea65156909838fa6c22825cafe090ff8030",
        "$(md5 $(sha1 foo) bar)": "196894290a831b2d2755c8de22619a97",
    }
    df = spark.createDataFrame([(1,)], "id long")
    exprs = [compile_template(t, {"id"}).alias(f"c{i}")
             for i, t in enumerate(cases)]
    row = df.select(*exprs).head()
    for i, (tmpl, exp) in enumerate(cases.items()):
        assert row[f"c{i}"] == exp, tmpl
    for bad in ("$(sha1)", "$(sha1 --length 5)",
                "$(sha1 --length invalid_length_specification foo)"):
        with _pytest.raises(ValueError):
            compile_template(bad, {"id"})


def test_format_welf_port(spark):
    """Port of modules/kvformat/tests/test_format_welf.c (the binary /
    invalid-UTF-8 escape cases cannot arise in Spark strings and are
    not ported)."""
    df = spark.createDataFrame(
        [("árvíztűrőtükörfúrógép", 'binary stuff follows " rest')],
        "text string, escaping string",
    )
    cols = {"text", "escaping"}

    def ev(t):
        return df.withColumn("o", compile_template(t, cols)).head()["o"]

    assert ev("$(format-welf MSG=$MSG)") == "MSG=árvíztűrőtükörfúrógép"
    assert (
        ev("xxx$(format-welf MSG=$MSG)yyy")
        == "xxxMSG=árvíztűrőtükörfúrógépyyy"
    )
    # space → quoted, inner quotes escaped
    assert (
        ev("$(format-welf MSG=$escaping)")
        == 'MSG="binary stuff follows \\" rest"'
    )


def test_format_welf_space_quoting(spark):
    df = spark.createDataFrame([(1,)], "id2 long").withColumn(
        "nv", F.create_map(F.lit("with_space"), F.lit("with space"))
    )
    out = df.withColumn(
        "o", compile_template("$(format-welf --key with_space)", {"nv", "id2"})
    ).head()["o"]
    assert out == 'with_space="with space"'


def test_format_welf_key_and_exclude(spark):
    """key_and_exclude parameterized table from test_format_welf.c."""
    nv = {
        "prefix.key1": "value1",
        "prefix.key2": "value2",
        "prefix.exclude1": "exclude1",
        "prefix.exclude2": "exclude2",
    }
    df = spark.createDataFrame([(1,)], "id2 long").withColumn(
        "nv", F.create_map(*[F.lit(x) for kv in nv.items() for x in kv])
    )
    cases = {
        "$(format-welf --key prefix.key*)":
            "prefix.key1=value1 prefix.key2=value2",
        "$(format-welf --key prefix.key1,prefix.key2)":
            "prefix.key1=value1 prefix.key2=value2",
        "$(format-welf --key prefix.* --exclude prefix.exclude*)":
            "prefix.key1=value1 prefix.key2=value2",
        "$(format-welf --key prefix.* --exclude prefix.exclude1,prefix.exclude2)":
            "prefix.key1=value1 prefix.key2=value2",
        "$(format-welf --key prefix.* --exclude prefix.exclude1 --exclude prefix.exclude2)":
            "prefix.key1=value1 prefix.key2=value2",
        "$(format-welf --key prefix.* --exclude prefix.exclude* --exclude prefix.key2)":
            "prefix.key1=value1",
    }
    exprs = [compile_template(t, {"nv", "id2"}).alias(f"c{i}")
             for i, t in enumerate(cases)]
    row = df.select(*exprs).head()
    for i, (tmpl, exp) in enumerate(cases.items()):
        assert row[f"c{i}"] == exp, tmpl


def test_format_welf_id_sorts_first(spark):
    nv = {"id": "7", "aaa": "x"}
    df = spark.createDataFrame([(1,)], "id2 long").withColumn(
        "nv", F.create_map(*[F.lit(x) for kv in nv.items() for x in kv])
    )
    out = df.withColumn(
        "o", compile_template("$(format-welf --key *)", {"nv", "id2"})
    ).head()["o"]
    assert out.startswith("id=7 ")


def test_graphite_output(msg):
    """modules/graphite/graphite-output.c + the light suite
    (template_functions/graphite-output/test_graphite_output.py):
    'name value timestamp\\n' per pair (every line terminated), keys
    sorted, leading '.' rewritten to '_', --timestamp template,
    default timestamp $R_UNIXTIME."""
    # C unit test: explicit pair, default timestamp (= R_UNIXTIME,
    # which in batch is the event time: 2026-02-11T21:27:22Z)
    import calendar, datetime as _dt
    unx = str(calendar.timegm(_dt.datetime(2026, 2, 11, 21, 27, 22).timetuple()))
    assert _one(msg, "$(graphite-output local.random.diceroll=4)") == (
        f"local.random.diceroll 4 {unx}\n"
    )
    # light case: --timestamp literal + --key glob over the nv map
    df = msg.withColumn(
        "nv",
        F.create_map(
            F.lit("test.key1"), F.lit("value1"),
            F.lit("test.key2"), F.lit("value2"),
        ),
    )
    assert _one(df, "$(graphite-output --timestamp custom_timestamp --key test.*)") == (
        "test.key1 value1 custom_timestamp\n"
        "test.key2 value2 custom_timestamp\n"
    )
    # hardwired replace-prefix: leading '.' -> '_'
    df2 = msg.withColumn(
        "nv", F.create_map(F.lit(".hidden.k"), F.lit("9"))
    )
    assert _one(df2, "$(graphite-output --timestamp T --key .hidden.*)") == (
        "_hidden.k 9 T\n"
    )
