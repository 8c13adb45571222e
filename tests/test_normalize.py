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


# ---- strip_html -------------------------------------------------------------


HTML_CASES = [
    (
        '<html><head><script>var x="</p>";</script><style>p{}</style>'
        '</head><body><!-- hidden <b>x</b> --><h1>Title</h1>'
        '<p class="a">hello <b>world</b></p><br/>tail '
        "&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</body></html>",
        'Title hello world tail & <tag> "q" \'s\' end',
    ),
    ("no markup at all", "no markup at all"),
    # '&amp;lt;' must decode ONCE: '&amp;' → '&' last, never re-scanned
    ("&amp;lt; stays literal", "&lt; stays literal"),
    # case-insensitive script kill, attribute junk in the open tag
    ("a <SCRIPT a='1' b>alert(1)</ScRiPt> b", "a b"),
    # multi-line script body + comment spanning lines
    ("x <script>\nline1\nline2\n</script>\n<!--\nc\n--> y", "x y"),
    # documented non-goal: tag-shaped '< b and c >' is stripped
    ("a < b and c > d", "a d"),
    (None, None),
    ("", ""),
]


def test_strip_html_table(spark):
    from syslog_ng_spark.operators.normalize import strip_html

    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_CASES)], ["i", "text"]
    )
    got = {r["i"]: r["text"] for r in strip_html(df).collect()}
    for i, (_, exp) in enumerate(HTML_CASES):
        assert got[i] == exp, HTML_CASES[i][0]


def test_strip_html_no_entity_decode_no_collapse(spark):
    from syslog_ng_spark.operators.normalize import strip_html

    df = spark.createDataFrame([("<b>a</b>  &amp;  b",)], ["text"])
    row = strip_html(
        df, decode_entities=False, collapse_ws=False, target="out"
    ).collect()[0]
    assert row["out"] == " a   &amp;  b"
    assert row["text"] == "<b>a</b>  &amp;  b"  # target leaves source


def test_strip_html_zero_shuffle_codegen(spark, tmp_path):
    from syslog_ng_spark.operators.normalize import strip_html

    path = str(tmp_path / "h")
    spark.createDataFrame(
        [(i, f"<p>doc {i}</p>") for i in range(50)], ["i", "text"]
    ).write.parquet(path)
    plan = (
        strip_html(spark.read.parquet(path))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "*(1) Project" in plan, plan
