"""Resumable routed pipeline: checkpoint/lineage/metrics integration.

The north-rule requirement: the parse→route→write pipeline must be
resumable from per-partition checkpoints carrying lineage and throughput
metrics. Units of work are partition values (a date, a conv_id bucket);
each unit's sink writes are overwrite-by-unit (idempotent), and the
marker — committed only after all sinks land — records per-sink counts
and wall time. A killed run re-executes only missing units, and replays
cannot change totals (persist-state/bookmark analogue,
/root/reference/lib/ack-tracker/bookmark.h:39-48).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.checkpoint import CheckpointedRun
from .pipeline import Pipeline


def run_resumable(
    df: DataFrame,
    pipeline: Pipeline,
    base_path: str,
    ckpt: CheckpointedRun,
    unit_col: str,
    units: list | None = None,
    fmt: str = "parquet",
) -> list:
    """Process every unit not yet marked done. Returns units processed
    in THIS invocation (empty = fully resumed already)."""
    if units is None:
        units = sorted(
            r[0] for r in df.select(unit_col).distinct().collect()
        )
    processed = []
    for u in units:
        if ckpt.is_done(str(u)):
            continue
        t0 = time.time()
        part = df.filter(F.col(unit_col) == u)
        routed = pipeline.route(part, persist=True)
        try:
            counts = {}
            for p in pipeline.paths:
                dest = f"{base_path}/{p.name}/{unit_col}={u}"
                sink_df = routed.sink(p.name)
                sink_df.write.mode("overwrite").format(fmt).save(dest)
                counts[p.name] = None  # filled from the single metrics agg
            m = {
                r.path: (r.route_ingress_total, r.route_egress_total)
                for r in routed.metrics().collect()
            }
        finally:
            routed.unpersist()
        wall = time.time() - t0
        rows_out = sum(v[1] for v in m.values())
        ckpt.commit(
            str(u),
            wall_ms=int(wall * 1000),
            rows=rows_out,
            sinks={k: {"in": v[0], "out": v[1]} for k, v in m.items()},
            throughput_rows_per_s=round(rows_out / wall, 1) if wall > 0 else None,
        )
        processed.append(u)
    return processed


def sink_totals(
    spark: SparkSession, base_path: str, pipeline: Pipeline, fmt: str = "parquet"
) -> dict:
    """Read back every sink's total row count (the resume-parity oracle)."""
    out = {}
    for p in pipeline.paths:
        try:
            out[p.name] = spark.read.format(fmt).load(f"{base_path}/{p.name}").count()
        except Exception:  # noqa: BLE001 — sink may be empty/absent
            out[p.name] = 0
    return out
