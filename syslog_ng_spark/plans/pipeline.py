"""Log-path routing: syslog-ng's query semantics, compiled to one pass.

The reference fans every message out to an ordered forest of branches
(/root/reference/lib/logmpx.c:79-176): a branch with ``flags(final)``
that matches consumes the message for later branches (logmpx.c:112-117);
``flags(fallback)`` branches run in a second pass over messages no
normal branch matched (logmpx.c:93-106); ``flags(catchall)`` re-attaches
to all sources (cfg-tree.c:1571-1576).

Spark rebuild — the CoW fan-out becomes *compute once, write N times*:
1. every branch's match predicate is evaluated in ONE projection over the
   shared frame (mirrors the multiplexer's single traversal);
2. delivery columns encode final/fallback semantics as pure boolean
   algebra — Catalyst folds them into the same whole-stage-codegen stage;
3. the routed frame is persisted once (the CoW analogue) and each sink
   filters on its own delivery column — N narrow writes, zero shuffle;
4. per-path ingress/egress counters (lib/metrics-pipe.c:29-73) come from
   a single aggregate over the delivery columns — one job, not N counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.filters import FilterExpr

FLAG_FINAL = "final"
FLAG_FALLBACK = "fallback"
FLAG_CATCHALL = "catchall"


def _pred(p) -> Column:
    """Filter predicate with syslog-ng semantics: NULL = no-match (a filter
    either matches or it doesn't — three-valued SQL NULL would silently
    leak rows out of fallback paths)."""
    if p is None:
        return F.lit(True)
    c = p.to_column() if isinstance(p, FilterExpr) else p
    return F.coalesce(c, F.lit(False))


@dataclass
class LogPath:
    """One ``log { ... destination(name); }`` statement.

    ``sources``: names of the sources this path attaches to (None = all).
    A ``catchall`` path ignores its source list and re-attaches to every
    source (cfg-tree.c:1571-1576).
    """

    name: str
    filter: object = None  # FilterExpr | Column | None
    flags: frozenset = field(default_factory=frozenset)
    transform: Callable[[DataFrame], DataFrame] | None = None  # per-branch stages
    sources: tuple | None = None

    def has(self, flag: str) -> bool:
        return flag in self.flags


class RoutedFrame:
    """The routed stream: one persisted frame + per-sink views + metrics."""

    def __init__(self, df: DataFrame, paths: list[LogPath], persist: bool):
        self.paths = paths
        self.df = df.persist() if persist else df

    def sink(self, name: str) -> DataFrame:
        path = next(p for p in self.paths if p.name == name)
        out = self.df.filter(F.col(f"_deliver_{name}"))
        out = out.drop(*[c for c in out.columns if c.startswith(("_match_", "_deliver_", "_ingress_"))])
        if path.transform is not None:
            out = path.transform(out)
        return out

    def metrics(self) -> DataFrame:
        """Per-path ingress/egress counters in ONE aggregate job
        (route_ingress_total / route_egress_total analogue)."""
        aggs = []
        for p in self.paths:
            aggs.append(
                F.sum(F.col(f"_ingress_{p.name}").cast("long")).alias(f"in_{p.name}")
            )
            aggs.append(
                F.sum(F.col(f"_deliver_{p.name}").cast("long")).alias(f"out_{p.name}")
            )
        row = self.df.agg(*aggs).collect()[0]
        spark = self.df.sparkSession
        data = [
            (p.name, int(row[f"in_{p.name}"] or 0), int(row[f"out_{p.name}"] or 0))
            for p in self.paths
        ]
        return spark.createDataFrame(
            data, "path string, route_ingress_total long, route_egress_total long"
        )

    def write_metrics(
        self, path: str, run_id: str = "run", fmt: str = "parquet"
    ) -> DataFrame:
        """Persist the per-path counters as a table (the internal()/
        stats-csv control-plane analogue, §3.3): re-readable as a source,
        appended per run for lineage."""
        m = self.metrics().withColumn("run_id", F.lit(run_id)).withColumn(
            "wall_ts", F.current_timestamp()
        )
        m.write.mode("append").format(fmt).save(path)
        return m

    def write_sinks(self, base_path: str, fmt: str = "parquet", mode: str = "overwrite") -> dict[str, str]:
        out = {}
        for p in self.paths:
            dest = f"{base_path}/{p.name}"
            self.sink(p.name).write.mode(mode).format(fmt).save(dest)
            out[p.name] = dest
        return out

    def unpersist(self) -> None:
        self.df.unpersist()


class Pipeline:
    """An ordered forest of log paths over one source frame."""

    def __init__(self, paths: list[LogPath]):
        names = [p.name for p in paths]
        assert len(set(names)) == len(names), "duplicate path names"
        self.paths = paths

    def route(
        self, df: DataFrame, persist: bool = True, source_col: str | None = None
    ) -> RoutedFrame:
        """Compute match/delivery/ingress columns for every path at once.

        ``source_col``: when the frame is a union of several sources (the
        reference's multiple ``source()`` statements feeding one daemon),
        name the column carrying the source id — paths with a
        ``sources`` list then only see their sources, and ``catchall``
        paths see everything (logmpx attach semantics).
        """
        normal = [
            p for p in self.paths
            if not p.has(FLAG_FALLBACK) and not p.has(FLAG_CATCHALL)
        ]
        fallbacks = [p for p in self.paths if p.has(FLAG_FALLBACK)]
        # catch-all paths re-attach directly to the SOURCE
        # (cfg-tree.c:1571-1576): they are OUTSIDE the matched/final
        # machinery — a message consumed by a final path still reaches
        # them, and their delivery never marks the message matched for
        # fallback purposes (tests/light logpath/test_multiple_flags.py
        # pins both properties)
        catchalls = [p for p in self.paths if p.has(FLAG_CATCHALL)]

        def attach(p: LogPath) -> Column:
            if p.has(FLAG_CATCHALL) or p.sources is None or source_col is None:
                return F.lit(True)
            return F.col(source_col).isin(list(p.sources))

        out = df
        # pass 1: evaluate every non-fallback branch's own predicate
        for p in normal:
            out = out.withColumn(f"_match_{p.name}", attach(p) & _pred(p.filter))
        for p in catchalls:
            m = _pred(p.filter)
            out = out.withColumn(f"_ingress_{p.name}", F.lit(True))
            out = out.withColumn(f"_deliver_{p.name}", m)

        # consumption prefix: _consumed_before_k = any earlier final branch matched
        consumed = F.lit(False)
        any_normal_match = F.lit(False)
        for p in normal:
            m = F.col(f"_match_{p.name}")
            ingress = ~consumed
            out = out.withColumn(f"_ingress_{p.name}", ingress)
            out = out.withColumn(f"_deliver_{p.name}", ingress & m)
            any_normal_match = any_normal_match | (ingress & m)
            if p.has(FLAG_FINAL):
                consumed = consumed | (ingress & m)

        # pass 2: fallback branches see only rows no normal branch matched
        # (logmpx.c:93-106 two-pass loop)
        for p in fallbacks:
            m = attach(p) & _pred(p.filter)
            out = out.withColumn(f"_ingress_{p.name}", ~any_normal_match & attach(p))
            out = out.withColumn(f"_deliver_{p.name}", ~any_normal_match & m)

        return RoutedFrame(out, self.paths, persist)


def log_scheduler(
    df: DataFrame,
    partition_key: Column | str,
    num_partitions: int,
    salt: int | None = None,
) -> DataFrame:
    """log-scheduler (lib/logscheduler.h:36-71): partition the stream by a
    key template for parallel delivery. ``salt`` spreads one hot key over
    that many sub-partitions (the north-rule hot-conversation defusal) —
    per-key ordering within a salt bucket is preserved, which is what the
    reference guarantees per scheduler partition."""
    key = F.col(partition_key) if isinstance(partition_key, str) else partition_key
    if salt:
        return df.repartition(
            num_partitions, key, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
        )
    return df.repartition(num_partitions, key)


def junction(df: DataFrame, channels: list[Callable[[DataFrame], DataFrame]]) -> DataFrame:
    """junction { channel {...} ... } — fork into embedded branches and
    re-join into one stream (cfg-tree.c:1218-1260)."""
    outs = [ch(df) for ch in channels]
    merged = outs[0]
    for o in outs[1:]:
        merged = merged.unionByName(o, allowMissingColumns=True)
    return merged


def if_else(
    df: DataFrame,
    cond,
    then: Callable[[DataFrame], DataFrame],
    otherwise: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """if (cond) {...} else {...} — sugar over a final-flagged junction
    (cfg-tree.c:426-624). Both arms run over disjoint row sets and
    re-union, preserving stream semantics."""
    c = _pred(cond)
    then_df = then(df.filter(c))
    else_df = (otherwise or (lambda d: d))(df.filter(~c | c.isNull()))
    return then_df.unionByName(else_df, allowMissingColumns=True)
