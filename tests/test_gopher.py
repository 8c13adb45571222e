"""Gopher quality rules (Rae et al. 2021 §A1.1): each rule pinned on a
handcrafted document that violates exactly that rule, plus NULL/empty
handling and the zero-shuffle plan contract."""

from pyspark.sql import functions as F

from syslog_ng_spark.operators.quality import gopher_rules

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away. "
    * 6
)  # 78 words, mean_wl ~3.9, has the/and/that? (the, and, with? the+and = 2 hits)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df, **kw).collect()}


def test_good_doc_keeps(spark):
    out = _run(spark, [(1, GOOD)])
    r = out[1]
    assert r["gopher_keep"] is True
    assert r["n_words"] == 78
    assert r["stop_hits"] >= 2


def test_each_rule_fires_alone(spark):
    rows = [
        (1, GOOD),
        (2, "too few words here"),  # word count
        (3, " ".join(["antidisestablishmentarianism"] * 60) + " the of"),  # mean wl
        (4, GOOD + " " + "# " * 20),  # symbol ratio
        (5, GOOD + ("\n- b" * 30)),  # bullet lines (31 lines, 30 bullets)
        (6, GOOD + ("\nwait for it..." * 3).replace("wait", "\nwait")),  # ellipsis
        (7, GOOD + " " + " ".join(str(n) for n in range(40))),  # alpha frac
        (8, " ".join(f"w{i % 9}x" for i in range(70))),  # no stopwords
        (9, ""),  # empty -> fails word count, keep False, no NULLs
        (10, None),
    ]
    out = _run(spark, rows)
    assert out[1]["gopher_keep"] is True
    fails = {
        2: "r_word_count",
        3: "r_mean_word_len",
        4: "r_symbol_ratio",
        5: "r_bullet_lines",
        6: "r_ellipsis_lines",
        7: "r_alpha_words",
        8: "r_stopwords",
    }
    for doc, rule in fails.items():
        assert out[doc][rule] is False, (doc, rule, out[doc])
        assert out[doc]["gopher_keep"] is False
    for doc in (9, 10):
        assert out[doc]["gopher_keep"] is False
        assert out[doc]["r_word_count"] is False
        # every audit column is non-NULL even for NULL text
        assert all(v is not None for k, v in out[doc].items() if k.startswith("r_"))


def test_thresholds_are_parameters(spark):
    out = _run(spark, [(1, "five small words right here plus the and of")],
               min_words=5)
    assert out[1]["r_word_count"] is True


def test_no_shuffle_no_udf(spark):
    df = (
        spark.range(0, 200, 1, 8)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(F.lit(GOOD + " tail"), F.col("doc_id").cast("string")))
    )
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF — pure Column signals


def test_gopher_null_text_audit_columns_zero(spark):
    """ADVICE r6: the n_words/stop_hits audit columns reported -1 for
    NULL text (size() is -1 under ANSI-off); the documented contract is
    counts/fractions defined as 0 with gopher_keep false."""
    from syslog_ng_spark.operators.quality import gopher_rules

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    for i in (1, 2):
        assert rows[i].n_words == 0
        assert rows[i].stop_hits == 0
        assert rows[i].mean_word_len == 0.0
        assert rows[i].gopher_keep is False
