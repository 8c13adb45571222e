"""Rewrite tests mirroring lib/rewrite/tests + the cc-mask light test."""

from pyspark.sql import functions as F

from syslog_ng_spark.operators import rewrite as RW


def test_set_value_template(spark):
    df = spark.createDataFrame([("web", "sshd")], "host string, program string")
    out = RW.set_value(df, "combined", "$host/$program").collect()[0]
    assert out.combined == "web/sshd"


def test_set_with_condition(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "x string, n int")
    out = RW.set_value(df, "x", F.lit("hit"), condition=F.col("n") == 1)
    assert [r.x for r in out.orderBy("n").collect()] == ["hit", "b"]


def test_subst_first_vs_global(spark):
    df = spark.createDataFrame([("foo bar foo",)], "v string")
    first = RW.subst(df, "foo", "X", "v").collect()[0].v
    assert first == "X bar foo"
    glob = RW.subst(df, "foo", "X", "v", global_=True).collect()[0].v
    assert glob == "X bar X"


def test_subst_no_match(spark):
    df = spark.createDataFrame([("abc",)], "v string")
    assert RW.subst(df, "zzz", "X", "v").collect()[0].v == "abc"


def test_unset_and_groupunset(spark):
    df = spark.createDataFrame([("a", "b", "c")], "k1 string, k2 string, other string")
    out = RW.unset(df, "k1").collect()[0]
    assert out.k1 is None and out.k2 == "b"
    out2 = RW.groupunset(df, "k*").collect()[0]
    assert out2.k1 is None and out2.k2 is None and out2.other == "c"


def test_tags(spark):
    df = spark.createDataFrame([(["a"],), (None,)], "tags array<string>")
    out = RW.set_tag(df, "new")
    assert [r.tags for r in out.collect()] == [["a", "new"], ["new"]]
    out2 = RW.clear_tag(out, "a")
    assert [r.tags for r in out2.collect()] == [["new"], ["new"]]


def test_set_tag_conditional(spark):
    df = spark.createDataFrame([(1, ["x"]), (2, ["x"])], "n int, tags array<string>")
    out = RW.set_tag(df, "big", condition=F.col("n") > 1)
    assert {tuple(r.tags) for r in out.collect()} == {("x",), ("x", "big")}


def test_set_severity_facility_pri(spark):
    df = spark.createDataFrame([(38,)], "pri int")  # auth.info
    assert RW.set_severity(df, "err").collect()[0].pri == 35  # auth.err
    assert RW.set_facility(df, "daemon").collect()[0].pri == 30  # daemon.info
    assert RW.set_pri(df, 165).collect()[0].pri == 165


def test_credit_card_mask(spark):
    df = spark.createDataFrame(
        [("paid with 4111111111111111 today",)], "payload string"
    )
    out = RW.credit_card_mask(df, "payload").collect()[0].payload
    assert out == "paid with 411111******1111 today"


def test_set_matches(spark):
    """test_set_matches.c 'numeric' case: items land in $1.., $0 unset."""
    from syslog_ng_spark.functions.templates import compile_template

    df = spark.createDataFrame([("foo,bar",)], "lst string")
    out = RW.set_matches(df, "lst")
    row = out.select(
        compile_template("$1").alias("m1"),
        compile_template("$2").alias("m2"),
        compile_template("${0:-unset}").alias("m0"),
    ).collect()[0]
    assert (row.m1, row.m2, row.m0) == ("foo", "bar", "unset")

    cleared = RW.unset_matches(out).collect()[0]
    assert cleared.matches is None


def test_rename(spark):
    df = spark.createDataFrame([(1,)], "a int")
    assert RW.rename(df, "a", "b").columns == ["b"]


def test_guess_timezone(spark):
    """A timestamp parsed 5h off from the receive time snaps to the
    offset that lands it nearest 'now' (guess-timezone heuristic)."""
    import datetime
    from syslog_ng_spark.operators.rewrite import guess_timezone

    ref = datetime.datetime(2026, 1, 5, 12, 0, 0)
    wrong = datetime.datetime(2026, 1, 5, 7, 0, 3)  # parsed 5h behind
    df = spark.createDataFrame([(wrong, ref)], "ts timestamp, recvd_ts timestamp")
    r = guess_timezone(df).collect()[0]
    assert r.tz_guess_offset == 5 * 3600
    assert abs((r.ts - ref).total_seconds()) <= 3


def test_groupset_old_value_and_multi_globs(spark):
    """test_rewrite.c group_set cases: '$_ alma' template appends to the
    old value of EACH matched field; values() accepts multiple globs."""
    df = spark.createDataFrame(
        [("v1", "v2", "other")], "field1 string, field2 string, aux string"
    )
    out = RW.groupset(df, "field*", "$_ alma").collect()[0]
    assert out.field1 == "v1 alma"
    assert out.field2 == "v2 alma"
    assert out.aux == "other"

    out2 = RW.groupset(df, ["field1", "aux"], "X").collect()[0]
    assert (out2.field1, out2.field2, out2.aux) == ("X", "v2", "X")


def test_cc_mask_and_cc_hash_light_port(spark):
    """Port of tests/light/functional_tests/rewrites/cc-mask/
    test_cc_mask_and_cc_hash.py — the 14-card brand corpus with the
    reference's exact expected mask and sha1-16 hash outputs."""
    cards = [
        ("American Express", "378282246310005", "378282******0005", "ea4654336c140e70"),
        ("American Express", "371449635398431", "371449******8431", "5e7d7549d9a51a21"),
        ("American Express Corporate", "378734493671000", "378734******1000", "b83feb75b1ce505d"),
        ("Diners Club", "30569309025904", "305693******5904", "58b3e8b7f99a5ab1"),
        ("Diners Club", "38520000023237", "385200******3237", "002f83eefd0b7e53"),
        ("Discover", "6011111111111117", "601111******1117", "0ccaaf4da33d3e26"),
        ("Discover", "6011000990139424", "601100******9424", "ff659bd8ffefdb2b"),
        ("JCB", "3530111333300000", "353011******0000", "4c1d57bdab8338e7"),
        ("JCB", "3566002020360505", "356600******0505", "9d9cafd187ba5590"),
        ("MasterCard", "5555555555554444", "555555******4444", "6589b0d46b6f2f0d"),
        ("MasterCard", "5105105105105100", "510510******5100", "21b95eabb14f0726"),
        ("Visa", "4111111111111111", "411111******1111", "68bfb396f35af387"),
        ("Visa", "4012888888881881", "401288******1881", "62163a017b168ad4"),
        ("Visa", "4222222222222", "422222******2222", "eb0f3622c9362fe9"),
    ]
    # the light test concatenates everything into ONE message
    msg = "".join(f"{brand}  {pan}" for brand, pan, _, _ in cards)
    exp_mask = "".join(f"{brand}  {m}" for brand, _, m, _ in cards)
    exp_hash = "".join(f"{brand}  {h}" for brand, _, _, h in cards)

    df = spark.createDataFrame([(msg,)], "message string")
    got_mask = RW.credit_card_mask(df, "message").head()["message"]
    got_hash = RW.credit_card_hash(df, "message").head()["message"]
    assert got_mask == exp_mask
    assert got_hash == exp_hash


def test_cc_hash_leaves_non_pan_digits(spark):
    df = spark.createDataFrame(
        [("pid 12345 port 443 total 99999999",)], "message string"
    )
    assert (
        RW.credit_card_hash(df, "message").head()["message"]
        == "pid 12345 port 443 total 99999999"
    )


def test_set_pri_light_table(spark):
    """Port of tests/light/functional_tests/rewrites/set-pri/
    test_set_pri.py: valid whole decimals in [0, 1023] apply; too-big,
    negative, non-numeric and empty values keep the old pri (38)."""
    import pyspark.sql.functions as F
    from syslog_ng_spark.operators import rewrite as RW

    df = spark.createDataFrame([(38, "x")], "pri int, text string")
    for value, want in [
        ("0", 0), ("42", 42), ("1023", 1023),
        ("5789", 38), ("-2", 38), ("test", 38), ("", 38),
    ]:
        got = RW.set_pri(df, F.lit(value)).collect()[0].pri
        assert got == want, (value, got, want)
