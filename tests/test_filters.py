"""Filter-expression tests mirroring lib/filter/tests (test_filters_fop_cmp.c,
test_filter_blank.c, test_filters_netmask.c, filter-pri/tags semantics)."""

from pyspark.sql import functions as F

from syslog_ng_spark.functions import filters as FL


def _rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def _eval(df, expr):
    return [r[0] for r in df.select(expr.to_column()).collect()]


def test_cmp_type_aware_numeric_vs_string(spark):
    df = _rows(spark, [("10", "9"), ("a", "b"), ("2", "10")], "l string, r string")
    # numbers compare numerically: "10" > "9", "2" < "10"
    got = _eval(df, FL.FCmp(F.col("l"), F.col("r"), ">", mode="type_aware"))
    assert got == [True, False, False]
    # string mode is bytewise: "10" < "9"
    got = _eval(df, FL.FCmp(F.col("l"), F.col("r"), ">", mode="string"))
    assert got == [False, False, True]


def test_cmp_numeric_mode(spark):
    df = _rows(spark, [("007", "7.0")], "l string, r string")
    assert _eval(df, FL.FCmp(F.col("l"), F.col("r"), "==", mode="numeric")) == [True]


def test_cmp_type_and_value(spark):
    df = _rows(spark, [("7", "7"), ("7", "a"), ("a", "a")], "l string, r string")
    got = _eval(df, FL.FCmp(F.col("l"), F.col("r"), "==", mode="type_and_value"))
    assert got == [True, False, True]


def test_and_or_not(spark):
    df = _rows(spark, [(1, 2)], "a int, b int")
    e = FL.FAnd(FL.FCmp(F.col("a"), 1), FL.FCmp(F.col("b"), 2))
    assert _eval(df, e) == [True]
    assert _eval(df, ~e) == [False]
    assert _eval(df, e | FL.FCmp(F.col("a"), 99)) == [True]


def test_match_pcre_string_glob(spark):
    df = _rows(spark, [("Accepted publickey for user",)], "text string")
    assert _eval(df, FL.FMatch(F.col("text"), r"Accepted \w+ for")) == [True]
    assert _eval(
        df, FL.FMatch(F.col("text"), "PUBLICKEY", "string", frozenset(["substring", "icase"]))
    ) == [True]
    assert _eval(df, FL.FMatch(F.col("text"), "Accepted*user", "glob")) == [True]
    assert _eval(df, FL.FMatch(F.col("text"), "Denied*", "glob")) == [False]


def test_severity_and_facility(spark):
    # pri=38 → facility 4 (auth), severity 6 (info)
    df = _rows(spark, [(38,), (165,)], "pri int")  # 165 → fac 20 local4, sev 5
    assert _eval(df, FL.FSeverity("info")) == [True, False]
    assert _eval(df, FL.FSeverity("err..emerg")) == [False, False]
    assert _eval(df, FL.FSeverity("notice", "info")) == [True, True]
    assert _eval(df, FL.FFacility("auth")) == [True, False]
    assert _eval(df, FL.FFacility("local4")) == [False, True]


def test_tags(spark):
    df = _rows(spark, [(["a", "b"],), ([],), (None,)], "tags array<string>")
    got = _eval(df, FL.FTags("b", "z"))
    assert got == [True, False, False]


def test_netmask(spark):
    df = _rows(
        spark, [("10.1.2.3",), ("192.168.1.5",), ("10.255.0.1",)], "src_ip string"
    )
    assert _eval(df, FL.FNetmask("10.0.0.0/8", F.col("src_ip"))) == [True, False, True]
    assert _eval(df, FL.FNetmask("192.168.1.0/24", F.col("src_ip"))) == [
        False,
        True,
        False,
    ]


def test_in_list(spark, tmp_path):
    df = _rows(spark, [("sshd",), ("cron",)], "program string")
    assert _eval(df, FL.FInList(["sshd", "nginx"], F.col("program"))) == [True, False]
    listfile = tmp_path / "progs.list"
    listfile.write_text("cron\n\n")
    assert _eval(df, FL.FInList(str(listfile), F.col("program"))) == [False, True]


def test_blank_and_named_filters(spark):
    df = _rows(spark, [("",), ("  ",), ("x",), (None,)], "text string")
    assert _eval(df, FL.FBlank(F.col("text"))) == [True, True, False, True]
    FL.define_filter("f_blank", FL.FBlank(F.col("text")))
    assert _eval(df, FL.FCall("f_blank")) == [True, True, False, True]


def test_netmask6(spark):
    df = _rows(
        spark,
        [("2001:db8::1",), ("2001:db8:ffff::1",), ("2600::1",), ("bogus",), (None,)],
        "src_ip string",
    )
    got = _eval(df, FL.FNetmask6("2001:db8::/32", F.col("src_ip")))
    assert got == [True, True, False, False, False]
    # /128 exact host
    got = _eval(df, FL.FNetmask6("2001:db8::1/128", F.col("src_ip")))
    assert got == [True, False, False, False, False]


def test_fop_cmp_c_table(spark):
    """Port of lib/filter/tests/test_filters_fop_cmp.c: '<'-style
    operators are type-aware (numeric when both sides parse), while
    lt/le/gt/ge/eq/ne compare STRINGS ('7 lt 10' is FALSE — '7' sorts
    after '10' bytewise). Fixture: SEVERITY_NUM=7, FACILITY_NUM=19,
    LEVEL_NUM=7."""
    from syslog_ng_spark.functions.filters import FCmp

    df = spark.createDataFrame([(7, 19)], "sev int, fac int")

    def ev(lhs, rhs, op, mode):
        col = FCmp(lhs, rhs, op, mode=mode).to_column()
        return df.select(col.alias("r")).collect()[0].r

    S, FN = F.col("sev"), F.col("fac")
    numeric_cases = [
        (10, 10, "==", True), (S, 7, "==", True), (S, S, "==", True),
        (10, 11, "==", False),
        (10, 9, "!=", True), (S, 8, "!=", True), (S, FN, "!=", True),
        (10, 10, "!=", False),
        (10, 11, "<", True), (7, 8, "<", True), (7, 10, "<", True),
        (S, 8, "<", True), (S, 10, "<", True),
        (11, 10, "<", False), (11, 11, "<", False),
        (11, 11, "<=", True), (10, 11, "<=", True), (11, 10, "<=", False),
        (11, 10, ">", True), (10, 7, ">", True), (10, 11, ">", False),
        (10, 10, ">=", True), (10, 11, ">=", False),
    ]
    for lhs, rhs, op, exp in numeric_cases:
        assert ev(lhs, rhs, op, "type_aware") is exp, (lhs, op, rhs)

    string_cases = [
        ("10", "10", "==", True), ("10", "11", "==", False),
        ("10", "9", "!=", True),
        ("10", "11", "<", True), ("7", "8", "<", True),
        ("7", "10", "<", False),        # '7' > '10' bytewise
        ("11", "10", "<", False),
        ("11", "11", "<=", True), ("7", "10", "<=", False),
        ("11", "10", ">", True), ("8", "7", ">", True),
        ("10", "7", ">", False),        # '10' < '7' bytewise
        ("10", "10", ">=", True), ("10", "7", ">=", False),
    ]
    for lhs, rhs, op, exp in string_cases:
        assert ev(lhs, rhs, op, "string") is exp, (lhs, op, rhs)


def test_netmask_c_table(spark):
    """Port of lib/filter/tests/test_filters_netmask.c ip4 socket cases
    (source address 10.10.0.1 against various CIDRs; default/loopback
    when no saddr)."""
    from syslog_ng_spark.functions.filters import FNetmask

    df = spark.createDataFrame(
        [("10.10.0.1",), ("127.0.0.1",)], "saddr string"
    )
    cases = [
        ("10.10.0.0/16", ["10.10.0.1"]),
        ("10.10.0.0/24", ["10.10.0.1"]),
        ("10.10.10.0/24", []),
        ("0.0.10.10/24", []),
        ("127.0.0.1/32", ["127.0.0.1"]),
        ("127.0.0.2/32", []),
    ]
    for cidr, exp in cases:
        got = [
            r.saddr
            for r in df.filter(
                FNetmask(cidr, F.col("saddr")).to_column()
            ).collect()
        ]
        assert got == exp, cidr
