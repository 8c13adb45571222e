"""URL parsing / normalization / eTLD+1 (operators/weburl.py).

Covers the RFC-3986-lite parse table, public-suffix handling, URL
canonicalization, domain blocklisting (literal + broadcast anti-join)
and the plan-shape guarantees (parse/normalize zero-shuffle,
domain_stats exactly one exchange)."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.weburl import (
    domain_stats,
    filter_blocked_domains,
    normalize_url,
    parse_url_fields,
    registrable_domain,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# (url, scheme, host, port, path, query, fragment)
PARSE_CASES = [
    ("http://example.com", "http", "example.com", None, "", None, None),
    ("HTTPS://WWW.Example.COM/", "https", "www.example.com", None, "/", None, None),
    (
        "https://u:p@host.org:8443/a/b?x=1&y=2#frag",
        "https",
        "host.org",
        8443,
        "/a/b",
        "x=1&y=2",
        "frag",
    ),
    ("ftp://files.net:21/pub/f.txt", "ftp", "files.net", 21, "/pub/f.txt", None, None),
    ("http://[2001:db8::1]:8080/v6", "http", "[2001:db8::1]", 8080, "/v6", None, None),
    ("http://10.0.0.1/x", "http", "10.0.0.1", None, "/x", None, None),
    # query/fragment present but empty → NULLed (no '?'/'#' payload)
    ("http://e.com/p?#", "http", "e.com", None, "/p", None, None),
    ("not a url", None, None, None, None, None, None),
    ("", None, None, None, None, None, None),
    ("//missing.scheme/x", None, None, None, None, None, None),
]


def test_parse_url_fields_table(spark):
    df = spark.createDataFrame([(u,) for u, *_ in PARSE_CASES], ["url"])
    rows = {
        r["url"]: r
        for r in parse_url_fields(df).collect()
    }
    for url, scheme, host, port, path, query, frag in PARSE_CASES:
        r = rows[url]
        exp_path = path if scheme is not None else None
        assert r["url_scheme"] == scheme, url
        assert r["url_host"] == host, url
        assert r["url_port"] == port, url
        assert r["url_path"] == exp_path, url
        assert r["url_query"] == query, url
        assert r["url_fragment"] == frag, url


ETLD_CASES = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("foo.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    # bare multi-label suffix: nothing registrable below it → pass through
    ("co.uk", "co.uk"),
    ("deep.sub.blogspot.com.au", "blogspot.com.au"),
    ("localhost", "localhost"),
    ("10.1.2.3", "10.1.2.3"),
    ("[2001:db8::1]", "[2001:db8::1]"),
    (None, None),
]


def test_registrable_domain_table(spark):
    df = spark.createDataFrame(
        [(h,) for h, _ in ETLD_CASES], "host: string"
    )
    got = df.select(
        "host", registrable_domain(F.col("host")).alias("d")
    ).collect()
    exp = dict(ETLD_CASES)
    for r in got:
        assert r["d"] == exp[r["host"]], r["host"]


NORM_CASES = [
    ("HTTP://Example.COM", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # http on 443 is NOT default → kept
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://u:pw@Host.ORG/p?q=1#frag", "https://host.org/p?q=1"),
    ("ws://E.com:80?x=2", "ws://e.com/?x=2"),
    ("garbage", None),
]


def test_normalize_url_table(spark):
    df = spark.createDataFrame([(u,) for u, _ in NORM_CASES], ["url"])
    got = {r["url"]: r["url_norm"] for r in normalize_url(df).collect()}
    for url, exp in NORM_CASES:
        assert got[url] == exp, url


def test_normalize_reuses_parsed_columns(spark):
    df = spark.createDataFrame([("http://A.com:80/x",)], ["url"])
    parsed = parse_url_fields(df)
    out = normalize_url(parsed, parsed=True).collect()[0]
    assert out["url_norm"] == "http://a.com/x"


@pytest.fixture()
def url_corpus(spark):
    rows = [
        (1, "http://a.example.com/1"),
        (2, "https://b.example.com/2"),
        (3, "http://evil.bad.org/3"),
        (4, "https://sub.evil.co.uk/4"),
        (5, "junk"),
        (6, "http://ok.net/6"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_filter_blocked_literal_list(url_corpus):
    kept = filter_blocked_domains(url_corpus, ["bad.org", "evil.co.uk"])
    ids = sorted(r["doc_id"] for r in kept.collect())
    # unparseable (5) is kept: a NULL domain can't be blocklisted
    assert ids == [1, 2, 5, 6]


def test_filter_blocked_keep_flag(url_corpus):
    flagged = filter_blocked_domains(
        url_corpus, ["bad.org"], keep_flag="kept"
    )
    got = {r["doc_id"]: r["kept"] for r in flagged.collect()}
    assert got == {1: True, 2: True, 3: False, 4: True, 5: True, 6: True}


def test_filter_blocked_dataframe_is_broadcast_anti_join(spark, url_corpus):
    bl = spark.createDataFrame([("bad.org",), ("evil.co.uk",)], ["domain"])
    kept = filter_blocked_domains(url_corpus, bl)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 5, 6]
    plan = _plan(kept)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_filter_blocked_dataframe_keep_flag(spark, url_corpus):
    bl = spark.createDataFrame([("bad.org",), ("evil.co.uk",)], ["domain"])
    flagged = filter_blocked_domains(url_corpus, bl, keep_flag="kept")
    got = {r["doc_id"]: r["kept"] for r in flagged.collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True, 6: True}
    assert "_dom" not in flagged.columns and "_blocked" not in flagged.columns


def test_domain_stats(spark, url_corpus):
    out = {
        r["domain"]: (r["n_docs"], r["n_hosts"])
        for r in domain_stats(url_corpus).collect()
    }
    assert out["example.com"] == (2, 2)
    assert out["bad.org"] == (1, 1)
    assert out[None] == (1, 0)


def test_domain_stats_weight_col(spark):
    df = spark.createDataFrame(
        [(1, "http://a.com/x", 10), (2, "http://b.a.com/y", 32)],
        ["doc_id", "url", "n_chars"],
    )
    row = domain_stats(df, weight_col="n_chars").collect()[0]
    assert row["domain"] == "a.com"
    assert row["sum_n_chars"] == 42


# ---- plan shape -----------------------------------------------------------


def test_parse_normalize_etld_zero_shuffle(spark, tmp_path):
    path = str(tmp_path / "u")
    spark.createDataFrame(
        [(i, f"http://h{i}.example.com/p") for i in range(100)],
        ["doc_id", "url"],
    ).write.parquet(path)
    df = spark.read.parquet(path)
    out = normalize_url(df).withColumn(
        "etld1", registrable_domain(F.col("url_host"))
    )
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    # '*(n)' prefixes mark whole-stage-codegen stages in executedPlan
    assert "*(1) Project" in plan, plan


def test_domain_stats_one_exchange_partial_agg(spark, tmp_path):
    path = str(tmp_path / "u2")
    spark.createDataFrame(
        [(i, f"http://h{i % 7}.example.com/p") for i in range(100)],
        ["doc_id", "url"],
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = _plan(domain_stats(df))
    # count-distinct(host) per domain = expand + two-level agg, but the
    # data crosses the wire on exactly one hash exchange key family
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "partial" in plan.lower(), plan
