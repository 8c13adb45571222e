"""Checkpoint/resume tests: persist-state analogue (FIXTURES.md F7) —
re-running after a simulated kill must not change per-sink totals."""

from pyspark.sql import functions as F

from syslog_ng_spark.sources.checkpoint import CheckpointedRun, process_partitioned


def test_resume_is_idempotent(spark, tmp_path, transcripts_df):
    sink = str(tmp_path / "sink")
    ckpt = CheckpointedRun(str(tmp_path / "state"), run_id="r1")

    units = [r.role for r in transcripts_df.select("role").distinct().collect()]

    def write_unit(part, unit):
        part.write.mode("overwrite").parquet(f"{sink}/{unit}")
        return part.count()

    # first run "dies" after two units
    done1 = process_partitioned(transcripts_df, "role", units[:2], ckpt, write_unit)
    assert sorted(done1) == sorted(units[:2])

    # resumed run processes only the remaining units
    done2 = process_partitioned(transcripts_df, "role", units, ckpt, write_unit)
    assert sorted(done2) == sorted(units[2:])

    # totals equal the source, and a third run is a no-op
    total = spark.read.parquet(*(f"{sink}/{u}" for u in units)).count()
    assert total == transcripts_df.count()
    assert process_partitioned(transcripts_df, "role", units, ckpt, write_unit) == []

    # markers carry lineage/metrics
    m = ckpt.metrics_df(spark)
    assert m.count() == len(units)
    assert {"unit", "run_id", "rows", "wall_ms"} <= set(m.columns)
    assert m.agg(F.sum("rows")).collect()[0][0] == transcripts_df.count()
