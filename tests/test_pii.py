"""PII scrubbing (operators/pii.py) — the generalized credit-card-mask
(reference scl/rewrite/cc-mask.conf)."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.pii import PII_PATTERNS, pii_counts, pii_scrub


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "id long, text string")


@pytest.mark.parametrize(
    "text,expected",
    [
        ("mail bob.smith+x@corp.example.co.uk now", "mail <EMAIL> now"),
        ("ssn 123-45-6789 end", "ssn <SSN> end"),
        ("card 4111 1111 1111 1111 ok", "card <CC> ok"),
        ("card 4111-1111-1111-1111 ok", "card <CC> ok"),
        ("from 192.168.0.1 to 10.0.0.255", "from <IP> to <IP>"),
        ("v6 2001:db8:85a3:0:0:8a2e:370:7334 x", "v6 <IP6> x"),
        ("call +1 (555) 123-4567 pls", "call <PHONE> pls"),
        ("call +36 30 555 1234 pls", "call <PHONE> pls"),
        ("nothing here 42", "nothing here 42"),
    ],
)
def test_each_kind(spark, text, expected):
    got = _one(spark, text).transform(pii_scrub).head()[1]
    assert got == expected


def test_order_ssn_before_phone(spark):
    # An SSN is phone-shaped; the fixed scrub order must claim it as SSN.
    got = _one(spark, "id 123-45-6789").transform(pii_scrub).head()[1]
    assert got == "id <SSN>"


def test_order_cc_before_ipv4_like_runs(spark):
    # 16 digits with separators is CC even though fragments look numeric.
    got = _one(spark, "n 1234 5678 9012 3456.").transform(pii_scrub).head()[1]
    assert got == "n <CC>."


def test_kinds_subset_and_target(spark):
    df = _one(spark, "a@b.co 1.2.3.4")
    out = pii_scrub(df, kinds=("ipv4",), target="scrubbed").head()
    assert out["text"] == "a@b.co 1.2.3.4"  # original untouched
    assert out["scrubbed"] == "a@b.co <IP>"


def test_counts_match_scrub(spark):
    df = _one(spark, "a@b.co c@d.io ssn 111-22-3333 ip 1.2.3.4 9.9.9.9")
    row = pii_counts(df, kinds=("email", "ssn", "ipv4")).head()
    assert (row["n_email"], row["n_ssn"], row["n_ipv4"]) == (2, 1, 2)


def test_counts_no_double_count(spark):
    # SSN consumed by the ssn pass must not also count as phone digits.
    df = _one(spark, "+1 555 123 4567 and 123-45-6789")
    row = pii_counts(df, kinds=("ssn", "phone")).head()
    assert (row["n_ssn"], row["n_phone"]) == (1, 1)


def test_patterns_are_re2_safe():
    # The DuckDB oracle runs the IDENTICAL patterns through RE2: no
    # lookarounds or backreferences may ever creep in.
    for kind, (pat, _) in PII_PATTERNS.items():
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat, kind
        assert "\\1" not in pat, kind


def test_null_text_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    assert pii_scrub(df).head()["text"] is None


def test_counts_zero_for_null_text(spark):
    # size(regexp_extract_all(NULL)) is NULL by default — counts must
    # come back 0 so aggregations don't silently skip null-text rows.
    df = spark.createDataFrame(
        [(1, None), (2, "a@b.co")], "id long, text string"
    )
    rows = {r["id"]: r for r in pii_counts(df, kinds=("email",)).collect()}
    assert rows[1]["n_email"] == 0
    assert rows[2]["n_email"] == 1
    total = pii_counts(df, kinds=("email",)).agg(
        F.sum("n_email").alias("s")
    ).head()["s"]
    assert total == 1


def test_plan_stays_codegen(spark):
    # Pure Column regexp chain: no UDF, no shuffle in the scrub itself.
    df = _one(spark, "x").transform(pii_scrub)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
