"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Everything is generated from pure Column expressions seeded through
``xxhash64`` — no driver-side loops, no Python RNG — so the same call is
reproducible and scales linearly with cluster size (generation of a
10^12-row corpus is a single ``spark.range`` pipeline).

The ``text`` column embeds the payload dialects the reference's parser
test suites exercise (RFC3164/RFC5424 syslog, KV, CSV, JSON, plain,
malformed edge cases) so the parse stage has real work to do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import ROLES, TOOLS

PROGRAMS = ["sshd", "nginx", "cron", "kernel", "postfix", "app-server"]
HOSTS = ["web-01", "web-02", "db-01", "cache-01", "worker-03"]
ACTIONS = ["login", "logout", "read", "write", "exec", "close"]
STATUSES = ["ok", "denied", "timeout", "error"]


def _h(seed: int, *cols: Column) -> Column:
    """Deterministic 64-bit hash of (seed, *cols); the only entropy source."""
    return F.xxhash64(F.lit(seed), *cols)


def _pick(options: list[str], seed: int, *cols: Column) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(seed, *cols), F.lit(len(options))) + 1).cast("int"))


def transcripts(
    spark: SparkSession,
    n_convs: int = 1_000,
    avg_turns: int = 10,
    hot_convs: int = 2,
    hot_factor: int = 100,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame.

    ``hot_convs`` conversations get ``hot_factor``× the average turn count —
    the Zipf-ish skew that the salted aggregation path must defuse.
    """
    conv = spark.range(n_convs, numPartitions=partitions).select(
        F.col("id").alias("cid"),
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
    )
    n_turns = (F.pmod(_h(seed, F.col("cid")), F.lit(2 * avg_turns - 1)) + 1).cast("int")
    n_turns = (
        F.when(F.col("cid") < hot_convs, F.lit(avg_turns * hot_factor)).otherwise(n_turns)
    )
    df = (
        conv.withColumn("n_turns", n_turns)
        .select(
            "cid",
            "conv_id",
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )

    cid, ti = F.col("cid"), F.col("turn_idx")

    # Strictly monotone per conversation: fixed per-conv gap (30..79s) plus a
    # per-turn jitter bounded below the gap, so ti*gap+jitter is increasing.
    # Conversations start staggered; cross-conv disorder arises naturally
    # (late-data analogue).
    gap = F.lit(30) + F.pmod(_h(seed + 1, cid), F.lit(50))
    jitter = F.pmod(_h(seed + 20, cid, ti), F.lit(29))
    start_off = F.pmod(_h(seed + 2, cid), F.lit(86400 * 30))
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2026-01-01 00:00:00")) + start_off + ti * gap + jitter
    )

    role = (
        F.when(ti == 0, F.lit("system"))
        .when(F.pmod(_h(seed + 3, cid, ti), F.lit(10)) == 0, F.lit("tool"))
        .otherwise(F.when(ti % 2 == 1, F.lit("user")).otherwise(F.lit("assistant")))
    )
    tool = F.when(
        F.pmod(_h(seed + 4, cid, ti), F.lit(5)) == 0, F.lit(None).cast("string")
    ).otherwise(_pick(TOOLS, seed + 5, cid, ti))

    df = df.withColumn("ts", ts).withColumn("role", role).withColumn("tool", tool)

    # --- payload dialects (FIXTURES.md F2) -----------------------------------
    host = _pick(HOSTS, seed + 6, cid, ti)
    prog = _pick(PROGRAMS, seed + 7, cid, ti)
    pid = F.pmod(_h(seed + 8, cid, ti), F.lit(30000)) + 1
    pri = F.pmod(_h(seed + 9, cid, ti), F.lit(191))  # facility 0..23, sev 0..7
    user = F.concat(F.lit("u"), F.pmod(_h(seed + 10, cid, ti), F.lit(500)))
    duration = F.round(F.pmod(_h(seed + 11, cid, ti), F.lit(100000)) / 100.0, 2)
    action = _pick(ACTIONS, seed + 12, cid, ti)
    status = _pick(STATUSES, seed + 13, cid, ti)
    ip = F.format_string(
        "10.%d.%d.%d",
        F.pmod(_h(seed + 14, cid, ti), F.lit(256)),
        F.pmod(_h(seed + 15, cid, ti), F.lit(256)),
        F.pmod(_h(seed + 16, cid, ti), F.lit(254)) + 1,
    )

    body = F.format_string(
        "action=%s user=%s src=%s duration=%s status=%s",
        action, user, ip, duration.cast("string"), status,
    )
    rfc3164 = F.format_string(
        "<%d>%s %s %s[%d]: %s",
        pri, F.date_format(ts, "MMM dd HH:mm:ss"), host, prog, pid, body,
    )
    rfc5424 = F.format_string(
        '<%d>1 %s %s %s %d ID%d [ex@32473 user="%s" status="%s"] %s',
        pri,
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        host, prog, pid, F.pmod(_h(seed + 17, cid, ti), F.lit(100)), user, status, body,
    )
    kv_line = F.format_string(
        'event=%s user=%s duration=%s msg="quoted value with = sign" status=%s',
        action, user, duration.cast("string"), status,
    )
    csv_line = F.format_string(
        '%s,"%s, Inc.",%d,%s,%s', host, prog, pid, duration.cast("string"), status
    )
    json_line = F.format_string(
        '{"event":"%s","user":"%s","duration":%s,"ctx":{"host":"%s","pid":%d}}',
        action, user, duration.cast("string"), host, pid,
    )
    plain = F.format_string(
        "the %s tool ran %s for %s and returned %s", tool, action, user, status
    )
    # Edge cases: missing PRI, empty, multi-line, trigger phrase.
    edge_pick = F.pmod(_h(seed + 18, cid, ti), F.lit(4))
    edge = (
        F.when(edge_pick == 0, F.format_string("%s %s: no pri header here", host, prog))
        .when(edge_pick == 1, F.lit(""))
        .when(edge_pick == 2, F.format_string("first line\n    indented continuation %s", status))
        .otherwise(F.lit("session closed"))
    )

    dialect = F.pmod(_h(seed + 19, cid, ti), F.lit(10))
    text = (
        F.when(dialect <= 2, rfc3164)
        .when(dialect == 3, rfc5424)
        .when(dialect <= 5, kv_line)
        .when(dialect == 6, csv_line)
        .when(dialect == 7, json_line)
        .when(dialect == 8, plain)
        .otherwise(edge)
    )

    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        text.alias("text"),
        "tool",
        "ts",
    )


def write_transcripts(spark: SparkSession, path: str, **kwargs) -> str:
    """Materialize a corpus to parquet (the Iceberg-table stand-in)."""
    transcripts(spark, **kwargs).write.mode("overwrite").parquet(path)
    return path
