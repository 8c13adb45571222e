"""Checkpoint / resume: the persist-state + bookmark analogue.

The reference acks messages backwards to release the source window and
persists bookmarks so a restart resumes where it left off
(/root/reference/lib/ack-tracker/bookmark.h:39-48,
lib/persist-state.h:90-122).

Batch rebuild: work is split into **idempotent units** (here: input
partition values, e.g. a date or conv_id bucket); each unit's sink write
is overwrite-by-unit, and a marker row (with lineage + throughput
metrics) is committed AFTER the write. Resume = skip units with markers.
Re-running after a kill cannot change per-sink totals — replayed units
overwrite themselves (the Iceberg-snapshot analogue on plain parquet).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedRun:
    """Tracks completed units in a JSON-lines marker file.

    Marker granularity is the caller's unit key (string). The marker file
    is the persist-state file; one line per completed unit carries the
    lineage/metrics payload (FIXTURES.md F7 shape).
    """

    def __init__(self, state_dir: str, run_id: str = "run"):
        self.state_dir = state_dir
        self.run_id = run_id
        os.makedirs(state_dir, exist_ok=True)
        self.marker_path = os.path.join(state_dir, f"{run_id}.markers.jsonl")

    def done_units(self) -> set[str]:
        if not os.path.exists(self.marker_path):
            return set()
        with open(self.marker_path) as fh:
            return {json.loads(line)["unit"] for line in fh if line.strip()}

    def is_done(self, unit: str) -> bool:
        return unit in self.done_units()

    def commit(self, unit: str, **metrics) -> None:
        rec = {"unit": unit, "run_id": self.run_id, "wall_ts": time.time(), **metrics}
        with open(self.marker_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def run_unit(self, unit: str, fn) -> dict | None:
        """Execute ``fn()`` for a unit unless already done; commit after.
        ``fn`` must be idempotent (overwrite-by-unit writes)."""
        if self.is_done(unit):
            return None
        t0 = time.time()
        result = fn() or {}
        self.commit(unit, wall_ms=int((time.time() - t0) * 1000), **result)
        return result

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.marker_path)


def process_partitioned(
    df: DataFrame,
    unit_col: str,
    units: list[str],
    ckpt: CheckpointedRun,
    write_unit,
) -> list[str]:
    """Drive a resumable run: for each unit value, filter (partition
    pruning when unit_col is the table's partition key), write, mark.
    Returns the units processed in THIS invocation."""
    processed = []
    for u in units:
        def job(u=u):
            part = df.filter(F.col(unit_col) == u)
            rows = write_unit(part, u)
            return {"rows": rows} if isinstance(rows, int) else {}

        if ckpt.run_unit(u, job) is not None:
            processed.append(u)
    return processed
