"""Unicode normalization (operators/normalize.py)."""

import pytest

from syslog_ng_spark.operators.normalize import normalize_text

COMBINING_ACUTE = "́"
DECOMPOSED_CAFE = "cafe" + COMBINING_ACUTE
PRECOMPOSED_CAFE = "café"


def _norm(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return normalize_text(df, **kw).head()[kw.get("target", "text")]


def test_nfc_composes_accents(spark):
    # 'cafe' + combining acute must byte-equal precomposed 'café'.
    assert _norm(spark, DECOMPOSED_CAFE) == PRECOMPOSED_CAFE


def test_nfkc_folds_compat(spark):
    # fi ligature (U+FB01) and fullwidth digits fold only under NFKC.
    assert _norm(spark, "ﬁle １２") == "ﬁle １２"
    assert _norm(spark, "ﬁle １２", form="NFKC") == "file 12"


def test_nfd_decomposes(spark):
    got = _norm(spark, PRECOMPOSED_CAFE, form="NFD", collapse_ws=False)
    assert got == DECOMPOSED_CAFE


def test_control_strip_keeps_tab_nl(spark):
    # C0 controls + DEL go; tab/newline/CR survive the strip (then the
    # whitespace collapse turns them into single spaces).
    assert _norm(spark, "a\x00b\x07c\x7fd") == "abcd"
    assert _norm(spark, "a\tb\nc", collapse_ws=False) == "a\tb\nc"


def test_ws_collapse_ascii_only(spark):
    assert _norm(spark, "  a \t\t b\n\nc  ") == "a b c"
    # U+00A0 (NBSP) is deliberately preserved — not ASCII whitespace.
    assert _norm(spark, "a b") == "a b"


def test_lowercase_and_target(spark):
    assert _norm(spark, "  CAFÉ  ", lowercase=True) == PRECOMPOSED_CAFE
    # target col leaves the original intact
    df = spark.createDataFrame([(1, "Á  B")], "id long, text string")
    row = normalize_text(df, target="norm").head()
    assert row["text"] == "Á  B"
    assert row["norm"] == "Á B"


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    assert normalize_text(df).head()["text"] is None


def test_enables_exact_dedup(spark):
    # The motivating case: byte-distinct but canonically equal docs
    # collapse to one after normalization.
    df = spark.createDataFrame(
        [(1, PRECOMPOSED_CAFE), (2, DECOMPOSED_CAFE), (3, "  café ")],
        "id long, text string",
    )
    n = normalize_text(df).select("text").distinct().count()
    assert n == 1
