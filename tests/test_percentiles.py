"""Distribution stats (operators/percentiles.py): exact interpolation
values, approx-sketch rank-error bound, label generation, plan shape."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.percentiles import (
    group_percentiles,
    percentile_labels,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_percentile_labels():
    assert percentile_labels([0.25, 0.5, 0.99, 0.999]) == [
        "p25",
        "p50",
        "p99",
        "p99_9",
    ]
    with pytest.raises(ValueError):
        percentile_labels([1.5])
    with pytest.raises(ValueError):
        percentile_labels([0.5, 0.50])


def test_exact_interpolation_known_values(spark):
    # percentile(p) = linear interpolation at rank p*(n-1), 0-indexed
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 7]  # sorted: 1 1 2 3 3 4 5 5 6 7 9
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    row = group_percentiles(
        df, "x", percentiles=(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    ).collect()[0]
    assert row["n"] == 11
    assert row["min"] == 1 and row["max"] == 9
    assert row["p0"] == 1.0
    assert row["p25"] == 2.5
    assert row["p50"] == 4.0
    assert row["p90"] == 7.0
    assert abs(row["p99"] - 8.8) < 1e-12
    assert row["p100"] == 9.0


def test_grouped_and_mode_validation(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(1, 101)] + [("b", i) for i in range(1, 11)],
        ["g", "x"],
    )
    out = {
        r["g"]: r
        for r in group_percentiles(df, "x", ["g"], percentiles=(0.5,)).collect()
    }
    assert out["a"]["p50"] == 50.5 and out["a"]["n"] == 100
    assert out["b"]["p50"] == 5.5 and out["b"]["n"] == 10
    with pytest.raises(ValueError):
        group_percentiles(df, "x", mode="wat")


def test_approx_rank_error_bound(spark):
    # rank error <= n/accuracy: with n=10_000, accuracy=100 the returned
    # value's true rank must be within 100 of the target rank — for a
    # uniform 1..n column value == rank, so |approx - exact| <= 100.
    n, accuracy = 10_000, 100
    df = spark.range(1, n + 1).select(F.col("id").cast("int").alias("x"))
    exact = group_percentiles(df, "x", percentiles=(0.1, 0.5, 0.9)).collect()[0]
    approx = group_percentiles(
        df, "x", percentiles=(0.1, 0.5, 0.9), mode="approx", accuracy=accuracy
    ).collect()[0]
    for lbl in ("p10", "p50", "p90"):
        assert abs(approx[lbl] - exact[lbl]) <= n / accuracy, lbl


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,)], "x: int"
    )
    row = group_percentiles(df, "x", percentiles=(0.5,)).collect()[0]
    assert row["n"] == 2 and row["p50"] == 2.0


def test_one_exchange_shared_buffer(spark, tmp_path):
    path = str(tmp_path / "p")
    spark.range(1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("int").alias("x")
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = _plan(group_percentiles(df, "x", ["g"]))
    assert plan.count("Exchange") == 1, plan
    # 5 requested quantiles must share ONE percentile aggregate buffer
    # (2 hits = the partial and final print of the same function)
    assert plan.count("percentile(") == 2, plan
