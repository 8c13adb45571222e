"""suppress() and rate-limit(): load-shedding operators.

- ``suppress(seconds)`` — writer-side dedup of consecutive identical
  messages, emitting a "last message repeated N times" summary
  (/root/reference/lib/logwriter.c:578-654).
- ``rate_limit(key, rate)`` — token-bucket drop above rate/sec per key
  (modules/rate-limit-filter/rate-limit.c). The batch analogue admits
  the first ``rate`` rows per (key, 1-second event-time window) —
  a documented divergence: the reference's bucket carries credit across
  seconds, the batch version is per-window exact.

Both are single-window-shuffle operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def suppress(
    df: DataFrame,
    seconds: float,
    identity: list[str] | Column,
    order_by: str | list[str] = "ts",
    partition_by: list[str] | None = None,
    emit_summary: bool = True,
    text_col: str = "text",
    allow_global_window: bool = False,
) -> DataFrame:
    """Drop consecutive duplicate rows within ``seconds``; keep the first
    of each run with ``suppressed`` = number of dropped duplicates.

    ``identity``: columns (or one Column) that define "identical message"
    — the reference compares the formatted message. Runs break when the
    identity changes OR the gap to the previous duplicate exceeds
    ``seconds`` (logwriter.c's suppress timer).

    ``order_by`` may be a list — pass a unique tiebreaker (e.g.
    ``["ts", "event_id"]``) so equal-timestamp rows order
    deterministically; with ``ts`` alone, run segmentation (and thus
    ``suppressed`` counts) can vary between runs/partitionings.

    ``partition_by=None`` means ONE global ordered sequence — on Spark
    that is a single-partition window (every row through one task), which
    does not scale. It raises unless ``allow_global_window=True``; the
    reference's suppress is also a single serial stream per writer
    (logwriter.c), so the global mode exists for strict parity on small
    data only. At scale, partition by host/program/source identity.
    """
    ident = (
        F.concat_ws("\x1f", *[F.col(c) for c in identity])
        if isinstance(identity, list)
        else identity
    )
    pk = partition_by or []
    if not pk and not allow_global_window:
        raise ValueError(
            "suppress(partition_by=None) builds a global single-partition "
            "window; pass partition_by or allow_global_window=True"
        )
    ob = [order_by] if isinstance(order_by, str) else list(order_by)
    ts_col = ob[0]
    w = W.partitionBy(*pk).orderBy(*[F.col(c) for c in ob])
    prev_ident = F.lag(ident).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.lag(
        F.unix_timestamp(F.col(ts_col))
    ).over(w)
    run_start = (
        prev_ident.isNull() | (prev_ident != ident) | (gap > seconds)
    )
    src = df.withColumn(
        "_run",
        F.sum(run_start.cast("int")).over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).withColumn("_first", run_start)

    runs = W.partitionBy(*pk, "_run")
    out = (
        src.withColumn("suppressed", F.count(F.lit(1)).over(runs) - 1)
        .filter(F.col("_first"))
        .drop("_run", "_first")
    )
    if emit_summary:
        out = out.withColumn(
            "summary",
            F.when(
                F.col("suppressed") > 0,
                F.format_string("last message repeated %d times", F.col("suppressed")),
            ),
        )
    return out


def rate_limit(
    df: DataFrame,
    key: list[str],
    rate: int,
    ts_col: str = "ts",
    per_seconds: int = 1,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``rate`` rows per key per ``per_seconds`` event-time
    window. Pass a unique ``order_by`` tiebreaker (e.g. ["ts",
    "event_id"]) for deterministic admission among equal timestamps."""
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / per_seconds)
    ob = [F.col(c) for c in (order_by or [ts_col])]
    w = W.partitionBy(*[F.col(k) for k in key], bucket).orderBy(*ob)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= rate)
        .drop("_rn")
    )


def throttle(df: DataFrame, key: list[str], rate: int, ts_col: str = "ts") -> DataFrame:
    """Destination-queue token bucket (lib/logqueue.c:182-213) — batch
    analogue identical to rate_limit at 1-second granularity."""
    return rate_limit(df, key, rate, ts_col)


def token_bucket_rate_limit(
    df: DataFrame,
    key: list[str],
    rate: float,
    ts_col: str = "ts",
    burst: float | None = None,
) -> DataFrame:
    """EXACT reference semantics (modules/rate-limit-filter/rate-limit.c):
    a per-key token bucket of capacity ``burst`` (default = rate) refilled
    continuously at ``rate`` tokens/sec of EVENT time; a row passes when a
    whole token is available and consumes it — credit carries across
    seconds, unlike the windowed ``rate_limit`` approximation.

    The scan is inherently sequential per key, so it runs as
    ``applyInPandas`` per key group (rows sorted by event time). A single
    pathologically hot key serializes its own group — same as the
    reference, where the bucket is one mutex'd counter per key.
    """
    import pandas as pd  # noqa: PLC0415

    cap = float(burst if burst is not None else rate)
    out_schema = df.schema

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = pdf[ts_col].astype("int64") / 1e9  # ns → s
        tokens = cap
        prev = None
        mask = []
        for t in ts:
            if prev is not None:
                tokens = min(cap, tokens + (t - prev) * rate)
            prev = t
            if tokens >= 1.0:
                tokens -= 1.0
                mask.append(True)
            else:
                mask.append(False)
        return pdf[pd.Series(mask, index=pdf.index)]

    return df.groupBy(*key).applyInPandas(keep, schema=out_schema)
