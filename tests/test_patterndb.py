"""PatternDB tests mirroring modules/correlation/tests/test_radix.c and
test_patterndb.c — wildcard parsing, typed extraction, program buckets."""

import pytest

from syslog_ng_spark.operators.patterndb import PdbRule, compile_pattern, patterndb

RULES = [
    PdbRule("r_login", "security", "sshd", "Accepted @ESTRING:auth_method: @for @ESTRING:user: @from @IPv4:src_ip@", ("auth",)),
    PdbRule("r_fail", "violation", "sshd", "Failed password for @ESTRING:user: @", ("auth", "fail")),
    PdbRule("r_cron", "system", "cron", "(@ESTRING:cron_user:)@ CMD (@ANYSTRING:cmd@)"),
    PdbRule("r_num", "system", "", "took @NUMBER:ms@ ms"),
    PdbRule("r_qstr", "system", "", "said @QSTRING:quote:\"@ loudly"),
    PdbRule("r_literal", "system", "", "exact literal line"),
]


def _classify(spark, rows):
    df = spark.createDataFrame(rows, "program string, msg string")
    return patterndb(df, RULES).collect()


def test_wildcard_compile():
    rx = compile_pattern("Accepted @ESTRING:m: @for @NUMBER:n@")
    assert rx.startswith("^")
    assert "(?P<g_m>[^\\ ]*)" in rx or "(?P<g_m>[^ ]*)" in rx
    assert "(?P<g_n>[0-9]+)" in rx


def test_classify_and_extract(spark):
    rows = [
        ("sshd", "Accepted publickey for alice from 10.1.2.3 port 22"),
        ("sshd", "Failed password for bob from 1.2.3.4"),
        ("cron", "(root) CMD (run-parts /etc/cron.hourly)"),
        ("app", "took 341 ms"),
        ("app", 'said "hello world" loudly'),
        ("app", "exact literal line"),
        ("app", "no rule matches this"),
    ]
    out = _classify(spark, rows)
    assert out[0].pdb_rule_id == "r_login"
    assert out[0].pdb_class == "security"
    assert out[0].pdb.values == {
        "auth.method": "publickey", "user": "alice", "src.ip": "10.1.2.3"
    } or out[0].pdb.values.get("user") == "alice"
    assert out[0].pdb.tags == ["auth"]
    assert out[1].pdb_rule_id == "r_fail"
    assert out[1].pdb.values["user"] == "bob"
    assert out[2].pdb_rule_id == "r_cron"
    assert out[2].pdb.values["cmd"] == "run-parts /etc/cron.hourly"
    assert out[3].pdb.values["ms"] == "341"
    assert out[4].pdb.values["quote"] == "hello world"
    assert out[5].pdb_rule_id == "r_literal"
    assert out[6].pdb_rule_id is None and not out[6].pdb_matched


def test_program_bucketing(spark):
    # same text, wrong program → only the catch-all-program rules apply
    out = _classify(spark, [("nginx", "Failed password for bob from x")])
    assert out[0].pdb_rule_id is None


def test_first_match_wins(spark):
    rules = [
        PdbRule("specific", "a", "", "error code @NUMBER:code@"),
        PdbRule("generic", "b", "", "error @ANYSTRING:rest@"),
    ]
    df = spark.createDataFrame([("p", "error code 42")], "program string, msg string")
    out = patterndb(df, rules).collect()[0]
    assert out.pdb_rule_id == "specific"
    assert out.pdb.values["code"] == "42"


def test_unknown_wildcard_raises():
    with pytest.raises(ValueError):
        compile_pattern("@BOGUS:x@")


def test_longest_literal_prefix_wins_regardless_of_order(spark):
    """radix.c semantics: the rule sharing the longest literal prefix
    with the message wins even when declared LAST."""
    rules = [
        PdbRule("generic", "b", "", "error @ANYSTRING:rest@"),
        PdbRule("specific", "a", "", "error code @NUMBER:code@"),  # declared after
    ]
    df = spark.createDataFrame([("p", "error code 42")], "program string, msg string")
    out = patterndb(df, rules).collect()[0]
    assert out.pdb_rule_id == "specific"
    assert out.pdb.values["code"] == "42"


def test_complete_match_beats_earlier_prefix(spark):
    """radix.c semantics: a later rule that consumes the WHOLE message
    wins over an earlier rule that only matches a prefix; the prefix rule
    still applies when nothing matches completely."""
    from syslog_ng_spark.operators.patterndb import PdbRule, patterndb

    rules = [
        PdbRule("r_prefix", "pfx", "", "session opened"),
        PdbRule("r_full", "full", "", "session opened for user @ESTRING:u:@"),
    ]
    df = spark.createDataFrame(
        [("session opened for user alice ",), ("session opened",), ("session openedXY",)],
        "msg string",
    )
    got = {r.msg: r.pdb_rule_id for r in patterndb(df, rules, program_col="msg", text_col="msg").collect()}
    assert got["session opened for user alice "] == "r_full"
    assert got["session opened"] == "r_prefix"       # complete literal match
    assert got["session openedXY"] == "r_prefix"     # partial fallback


def test_compile_pattern_at_escapes():
    """radix.c:1022-1053 '@@' escape: a doubled @ is a literal @, scanned
    left-to-right before parser specs (test_radix.c:240-254 idioms)."""
    from syslog_ng_spark.operators.patterndb import compile_pattern
    import re as _re

    assert _re.fullmatch(compile_pattern("a@@b"), "a@b")
    assert _re.fullmatch(compile_pattern("a@NUMBER:n@@@"), "a42@")
    assert _re.fullmatch(compile_pattern("baa@@"), "baa@")
    assert not _re.fullmatch(compile_pattern("a@@b"), "aXb")


def test_radix_longest_prefix_dispatch(spark):
    """Port of test_radix.c's literal table (lines 180-228): lookup
    resolves to the LONGEST inserted pattern that matches as a prefix —
    a complete match beats any prefix match, and among prefix matches the
    longest wins ('kort' → 'ko', 'koromp' → 'korom', 'kortes' → 'korte')."""
    from syslog_ng_spark.operators.patterndb import PdbRule, patterndb

    literals = ["alma", "korte", "barack", "dinnye", "almafa", "almabor",
                "almafa2", "ko", "koros", "koro", "koromporkolt", "korom",
                "korozott", "al", "all"]
    rules = [PdbRule(p, "t", "", p) for p in literals]
    cases = [
        ("kor", "ko"), ("ko", "ko"), ("kort", "ko"), ("korti", "ko"),
        ("korte", "korte"), ("kortes", "korte"), ("koromp", "korom"),
        ("korompo", "korom"), ("korompor", "korom"), ("korompok", "korom"),
        ("korompa", "korom"), ("koromi", "korom"), ("almafa", "almafa"),
        ("almafa2", "almafa2"), ("almafax", "almafa"), ("alm", "al"),
        ("nothing", None),
    ]
    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(cases)], "i int, msg string"
    )
    got = {r.i: r.pdb_rule_id
           for r in patterndb(df, rules, program_col="msg").collect()}
    for i, (k, exp) in enumerate(cases):
        assert got[i] == exp, f"{k!r}: {got[i]!r} != {exp!r}"


def test_radix_escape_and_parser_table(spark):
    """Port of test_radix.c's @@-escape + parser block (lines 240-295):
    doubled @ is a literal @, escapes compose with typed parsers, and a
    complete match by a parser rule beats everything."""
    from syslog_ng_spark.operators.patterndb import PdbRule, patterndb

    patterns = [
        "a@@NUMBER@@aa@@@@",      # literal 'a@NUMBER@aa@@'
        "a@@ab",                   # literal 'a@ab'
        "a@@a@@",                  # literal 'a@a@'
        "a@@@NUMBER:szam0@",       # 'a@' + NUMBER
        "a@NUMBER:szamx@aaa",
        "a@NUMBER@",
        "a@NUMBER@aa",
        "baa@@",                   # literal 'baa@'
        "@@a",                     # literal '@a'
        "@@",                      # literal '@'
        "@@@@",                    # literal '@@'
    ]
    rules = [PdbRule(p, "t", "", p) for p in patterns]
    cases = [
        ("a@", None),
        ("a@NUMBER@aa@@", "a@@NUMBER@@aa@@@@"),
        ("a@a", None),
        ("a@ab", "a@@ab"),
        ("a@a@", "a@@a@@"),
        ("a@ax", None),
        ("a@15555", "a@@@NUMBER:szam0@"),
        ("a15555aaa", "a@NUMBER:szamx@aaa"),
        ("@a", "@@a"),
        ("@", "@@"),
        ("@@", "@@@@"),
    ]
    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(cases)], "i int, msg string"
    )
    got = {r.i: r.pdb_rule_id
           for r in patterndb(df, rules, program_col="msg").collect()}
    for i, (k, exp) in enumerate(cases):
        assert got[i] == exp, f"{k!r}: {got[i]!r} != {exp!r}"
