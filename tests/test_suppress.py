"""suppress()/rate-limit tests mirroring lib/logwriter.c:578-654 semantics."""

import datetime

from syslog_ng_spark.operators.suppress import rate_limit, suppress


def _df(spark, rows):
    base = datetime.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (h, m, base + datetime.timedelta(seconds=off))
            for h, m, off in rows
        ],
        "host string, msg string, ts timestamp",
    )


def test_suppress_consecutive_duplicates(spark):
    df = _df(
        spark,
        [
            ("h1", "a", 0),
            ("h1", "a", 1),
            ("h1", "a", 2),
            ("h1", "b", 3),
            ("h1", "a", 4),  # new run (identity changed in between)
        ],
    )
    out = suppress(df, seconds=30, identity=["msg"], partition_by=["host"]).orderBy("ts").collect()
    assert [(r.msg, r.suppressed) for r in out] == [("a", 2), ("b", 0), ("a", 0)]
    assert out[0].summary == "last message repeated 2 times"
    assert out[1].summary is None


def test_suppress_window_expiry(spark):
    # duplicates farther apart than the window are NOT suppressed
    df = _df(spark, [("h1", "a", 0), ("h1", "a", 100)])
    out = suppress(df, seconds=30, identity=["msg"], partition_by=["host"]).collect()
    assert len(out) == 2
    assert all(r.suppressed == 0 for r in out)


def test_suppress_per_partition(spark):
    df = _df(spark, [("h1", "a", 0), ("h2", "a", 1)])
    out = suppress(df, seconds=30, identity=["msg"], partition_by=["host"]).collect()
    assert len(out) == 2  # different hosts never suppress each other


def test_rate_limit(spark):
    rows = [("h1", "m", i // 10) for i in range(40)]  # 10 msgs/sec over 4s
    df = _df(spark, rows)
    out = rate_limit(df, key=["host"], rate=3)
    assert out.count() == 12  # 3 per each of 4 seconds


def test_token_bucket_exact_semantics(spark):
    """Credit carries across seconds (unlike the windowed approximation):
    verified against a step-by-step Python oracle."""
    from syslog_ng_spark.operators.suppress import token_bucket_rate_limit

    # burst of 3 at t=0 consumes the bucket; then 1 token refills per 2s
    rows = [("h1", "m", i) for i in [0, 0, 0, 0, 1, 4, 6, 20, 20, 20, 20]]
    df = _df(spark, rows)
    out = token_bucket_rate_limit(df, key=["host"], rate=0.5, burst=3)
    kept = sorted(r.ts.second + r.ts.minute * 60 for r in out.collect())

    def oracle(offsets, rate, cap):
        tokens, prev, kept = cap, None, []
        for t in offsets:
            if prev is not None:
                tokens = min(cap, tokens + (t - prev) * rate)
            prev = t
            if tokens >= 1.0:
                tokens -= 1.0
                kept.append(t)
        return kept

    assert kept == oracle([0, 0, 0, 0, 1, 4, 6, 20, 20, 20, 20], 0.5, 3)
    # sanity: windowed rate_limit would keep 2 of the four t=20 rows at
    # rate=2/sec; the bucket keeps what its carried credit allows
