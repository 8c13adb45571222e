"""End-to-end resumable pipeline: kill/rerun must not change per-sink
totals (north-rule checkpoint requirement, FIXTURES.md F7)."""

from pyspark.sql import functions as F

from syslog_ng_spark.plans import LogPath, Pipeline
from syslog_ng_spark.plans.resumable import run_resumable, sink_totals
from syslog_ng_spark.sources.checkpoint import CheckpointedRun


def test_kill_and_resume_preserves_totals(spark, transcripts_df, tmp_path):
    pipe = Pipeline(
        [
            LogPath("assistant", F.col("role") == "assistant", frozenset(["final"])),
            LogPath("bash", F.col("tool") == "bash"),
            LogPath("rest", None, frozenset(["fallback"])),
        ]
    )
    base = str(tmp_path / "sinks")
    ckpt = CheckpointedRun(str(tmp_path / "state"), run_id="r1")
    units = sorted(r[0] for r in transcripts_df.select("role").distinct().collect())

    # run 1 "dies" after the first two units
    done1 = run_resumable(transcripts_df, pipe, base, ckpt, "role", units[:2])
    assert done1 == units[:2]

    # resume: only the remaining units execute
    done2 = run_resumable(transcripts_df, pipe, base, ckpt, "role")
    assert done2 == units[2:]

    # replay: nothing executes, totals unchanged
    assert run_resumable(transcripts_df, pipe, base, ckpt, "role") == []

    # parity vs a direct single-shot route
    direct = pipe.route(transcripts_df, persist=False)
    expected = {
        r.path: r.route_egress_total for r in direct.metrics().collect()
    }
    assert sink_totals(spark, base, pipe) == expected

    # lineage markers carry throughput metrics per unit
    m = ckpt.metrics_df(spark)
    assert m.count() == len(units)
    assert "throughput_rows_per_s" in m.columns
    assert "sinks" in m.columns


def test_overwrite_by_partition_is_idempotent(spark, transcripts_df, tmp_path):
    """Iceberg overwrite-by-partition analogue (TODO.md): re-running an
    ALREADY-COMMITTED unit with its marker removed rewrites the same
    partition directory in place — totals unchanged, no duplicate rows.
    This is the snapshot-overwrite semantics the Iceberg writer would
    give via REPLACE PARTITIONS; parquet dir-per-unit + overwrite mode is
    the stand-in (the container lacks the Iceberg runtime jars)."""
    from pyspark.sql import functions as F
    from syslog_ng_spark.plans import LogPath, Pipeline
    from syslog_ng_spark.plans.resumable import run_resumable, sink_totals
    from syslog_ng_spark.sources.checkpoint import CheckpointedRun

    df = transcripts_df.withColumn("unit", F.pmod(F.xxhash64("conv_id"), F.lit(4)))
    pipe = Pipeline(
        [
            LogPath("bash", F.col("tool") == "bash", frozenset(["final"])),
            LogPath("rest", None, frozenset(["fallback"])),
        ]
    )
    base = str(tmp_path / "sinks")
    ck = CheckpointedRun(str(tmp_path / "ckpt"))
    first = run_resumable(df, pipe, base, ck, "unit")
    assert len(first) == 4
    totals = sink_totals(spark, base, pipe)

    # simulate a lost marker for one committed unit: the replay overwrites
    # that partition rather than appending
    import json

    replay_unit = str(first[0])
    with open(ck.marker_path) as fh:
        lines = [ln for ln in fh if json.loads(ln)["unit"] != replay_unit]
    with open(ck.marker_path, "w") as fh:
        fh.writelines(lines)
    ck2 = CheckpointedRun(str(tmp_path / "ckpt"))
    second = run_resumable(df, pipe, base, ck2, "unit")
    assert [str(u) for u in second] == [replay_unit]
    assert sink_totals(spark, base, pipe) == totals
