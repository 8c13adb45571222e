"""Sources & sinks (SURVEY.md §2.1/§2.2).

The reference's file/socket/kafka sources collapse to table reads here:
the corpus lives in an Iceberg table (parquet fallback — the Iceberg jars
aren't in this container, so the format is chosen at runtime). Framing /
header-parse concerns become columns at generation/ingest time.

Sinks are table writes; the reference's batch_lines/flush tuning maps to
file sizing (`maxRecordsPerFile`, partition coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # Iceberg if the runtime has it; parquet otherwise
    import importlib.util

    HAVE_ICEBERG = importlib.util.find_spec("pyiceberg") is not None
except Exception:  # pragma: no cover
    HAVE_ICEBERG = False

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table (predicate/column pushdown comes
    free from the parquet scan — verify with .explain → PushedFilters)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write a sink table. ``max_records_per_file`` is the batch_lines
    analogue (logthrdestdrv.h:155) — bounds file size at 100 TB."""
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def write_sink_templated(
    df: DataFrame,
    path: str,
    partition_templates: dict[str, str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """$HOST-templated destination filenames (affile-dest.c) → partitioned
    table layout: each template becomes a partition column, so
    ``file("/log/$HOST/app.log")`` ≙ ``.partitionBy("host_dir")`` and the
    directory fan-out happens in ONE write job instead of per-key files."""
    from ..functions.templates import compile_template  # noqa: PLC0415

    cols = set(df.columns)
    out = df
    for name, tpl in partition_templates.items():
        out = out.withColumn(name, compile_template(tpl, cols))
    out.write.mode(mode).format(fmt).partitionBy(*partition_templates).save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Pre-bucketed managed table (SURVEY §4's co-location lever): two
    tables bucketed the same way join/aggregate on the bucket key with
    ZERO exchange — at 100 TB this turns the enrichment join's per-run
    shuffle into a one-time layout cost at write time (plan-asserted in
    tests). ``sort_cols`` additionally pre-sorts within buckets, removing
    the sort from sort-merge joins."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed managed table — bucket metadata rides the catalog,
    so downstream joins on the bucket key skip their exchange."""
    return spark.table(name)
