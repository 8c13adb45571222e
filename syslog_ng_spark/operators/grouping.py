"""grouping-by(): the reference's GROUP BY analogue, batch semantics.

Reference machinery (modules/correlation/grouping-parser.c:183-290,
groupingby.c): messages accumulate into correlation contexts keyed by a
template; ``where()`` pre-filters, ``timeout()`` closes a context after
event-time silence (timer wheel driven by message timestamps —
grouping-parser.c:79-114), ``trigger()`` closes it immediately,
``sort-key()`` orders the context, ``aggregate()`` emits a synthetic
message, ``having()`` post-filters, ``inject-mode()`` decides whether
originals pass through.

Batch rebuild:
- context identity = (key, session_id, trigger_split_id) where session_id
  comes from event-time sessionization (lag + running sum — one window
  shuffle) and trigger splits sessions at trigger rows;
- aggregation is a plain ``groupBy().agg()`` — partial (map-side) combine
  and AQE come free;
- ``sort-key`` ordering uses ``array_sort(collect_list(struct(...)))`` —
  deterministic regardless of partitioning;
- hot keys (one conversation with millions of turns) go through
  ``salted_agg``: two-phase partial→final aggregation on a salted key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.filters import FilterExpr


def _col(c) -> Column:
    if isinstance(c, FilterExpr):
        return c.to_column()
    return F.col(c) if isinstance(c, str) else c


# --- context aggregate helpers (basicfuncs/context-funcs.c analogues) --------


def context_length() -> Column:
    """$(context-length) — COUNT(*) (context-funcs.c:24-47)."""
    return F.count(F.lit(1))


def context_values(col) -> Column:
    """$(context-values $f) — collect_list (context-funcs.c:96-128)."""
    return F.collect_list(_col(col))


def context_lookup(cond, col) -> Column:
    """$(context-lookup filter $f) — filtered collect (context-funcs.c:50-92)."""
    return F.collect_list(F.when(_col(cond), _col(col)))


def grep(cond, col) -> Column:
    """$(grep cond $f) — cond-funcs.c:109-147."""
    return context_lookup(cond, col)


def sorted_values(sort_key, col) -> Column:
    """collect_list ordered by sort-key (correlation-context.c:72-77)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(_col(sort_key).alias("k"), _col(col).alias("v")))),
        lambda s: s["v"],
    )


# --- sessionization -----------------------------------------------------------


def sessionize(
    df: DataFrame,
    key: list[str],
    timeout: float | str | Column | None,
    trigger: Column | FilterExpr | None = None,
    ts_col: str = "ts",
    session_col: str = "ctx_id",
) -> DataFrame:
    """Assign a correlation-context id per row.

    Sessions close after ``timeout`` seconds of event-time silence per key
    (timer-wheel analogue); a ``trigger`` row closes its context with
    itself included (groupingby.c:109-111), the next row opens a new one.
    ``timeout`` may be a column (name or Column) for per-row timeouts —
    e.g. PatternDB rules each carrying their own context-timeout. A
    column timeout compares the gap against the PREVIOUS row's value:
    the timer a message arms is the one that expires before the next
    message (timer re-arm semantics, pdb-context.c); a scalar timeout is
    identical either way.
    """
    w = W.partitionBy(*key).orderBy(F.col(ts_col), F.col("turn_idx") if "turn_idx" in df.columns else F.col(ts_col))
    parts: list[Column] = []
    if timeout is not None:
        if isinstance(timeout, (str, Column)):
            tcol = F.col(timeout) if isinstance(timeout, str) else timeout
            timeout = F.lag(tcol).over(w)
        gap = F.unix_timestamp(F.col(ts_col)) - F.lag(
            F.unix_timestamp(F.col(ts_col))
        ).over(w)
        new_sess = gap.isNull() | (gap > timeout)
        parts.append(
            F.sum(new_sess.cast("int")).over(w.rowsBetween(W.unboundedPreceding, 0))
        )
    if trigger is not None:
        trig = _col(trigger)
        # row after a trigger starts a new sub-context
        prev_trig = F.lag(trig.cast("int"), 1, 0).over(w)
        parts.append(
            F.sum(prev_trig).over(w.rowsBetween(W.unboundedPreceding, 0))
        )
    if not parts:
        ctx = F.lit(0)
    elif len(parts) == 1:
        ctx = parts[0]
    else:
        ctx = F.concat_ws("/", *[p.cast("string") for p in parts])
    return df.withColumn(session_col, ctx)


# --- the operator ---------------------------------------------------------------


def grouping_by(
    df: DataFrame,
    key: list[str],
    aggregates: dict[str, Column],
    where: Column | FilterExpr | None = None,
    having: Column | FilterExpr | None = None,
    trigger: Column | FilterExpr | None = None,
    timeout: float | None = None,
    ts_col: str = "ts",
    inject_mode: str = "aggregate-only",
    internal_sink: str | None = None,
) -> DataFrame:
    """Correlate rows into contexts and emit synthetic aggregate rows.

    ``aggregates``: output column name → aggregate Column (use the
    context_* helpers). ``inject_mode`` (stateful-parser.h LGP_*):
    'aggregate-only' returns just the synthetic rows; 'pass-through'
    unions them under the original rows (missing columns null);
    'internal' routes the synthetic rows OFF the current path onto the
    internal() control stream — batch analogue: they are appended to
    ``internal_sink`` (a parquet path re-readable as a source, like
    Pipeline.write_metrics) and the original rows flow on unchanged.
    """
    src = df
    if where is not None:
        src = src.filter(_col(where))

    group_cols = list(key)
    if timeout is not None or trigger is not None:
        src = sessionize(src, key, timeout, trigger, ts_col=ts_col)
        group_cols = [*key, "ctx_id"]

    agg_exprs = [v.alias(k) for k, v in aggregates.items()]
    out = src.groupBy(*group_cols).agg(*agg_exprs)
    if "ctx_id" in out.columns:
        out = out.drop("ctx_id")

    if having is not None:
        out = out.filter(_col(having))

    if inject_mode == "aggregate-only":
        return out
    if inject_mode == "pass-through":
        return df.unionByName(out, allowMissingColumns=True)
    if inject_mode == "internal":
        if not internal_sink:
            raise ValueError("inject_mode='internal' needs internal_sink=")
        out.withColumn("source", F.lit("internal")).write.mode("append").parquet(
            internal_sink
        )
        return df
    raise ValueError(f"unknown inject_mode {inject_mode}")


# --- salted two-phase aggregation (hot-key defusal) ----------------------------

# Algebraic aggregates: (partial expr builder, final expr builder).
_SALTABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
    "collect_list": (lambda c: F.collect_list(c), lambda c: F.flatten(F.collect_list(c))),
    # Distinct-count over a salted phase 1 CANNOT recombine from
    # approx_count_distinct partials (summing per-salt cardinalities
    # double-counts values that land in several salt buckets). The
    # mergeable form is an HLL SKETCH: union of per-salt sketches is
    # lossless, so the final estimate equals the unsalted estimate.
    "hll_count_distinct": (
        lambda c: F.hll_sketch_agg(c),
        lambda c: F.hll_sketch_estimate(F.hll_union_agg(c)),
    ),
}


def salted_agg(
    df: DataFrame,
    key: list[str],
    aggs: dict[str, tuple[str, Column | str | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salted first phase.

    ``aggs``: out_name → (kind, column) with kind in count/sum/min/max/
    avg/collect_list. Phase 1 groups by (key, salt) — the hot key's rows
    spread over ``salt_buckets`` reducers; phase 2 combines the tiny
    partial frame on the true key. avg decomposes into sum+count.

    Matches plain groupBy results exactly (tested) — this is the
    log-scheduler partition-key + partial/final aggregation pattern
    (lib/logscheduler.h:36-71) done Spark-style.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in key], F.monotonically_increasing_id()), F.lit(salt_buckets))
    expanded: dict[str, tuple[str, Column | str | None]] = {}
    finals: dict[str, Column] = {}
    for name, (kind, col) in aggs.items():
        if kind == "avg":
            expanded[f"__{name}_sum"] = ("sum", col)
            expanded[f"__{name}_cnt"] = ("count", None)
            finals[name] = F.sum(f"__{name}_sum") / F.sum(f"__{name}_cnt")
        else:
            expanded[name] = (kind, col)
            partial, final = _SALTABLE[kind]
            finals[name] = final(F.col(name))

    partial_exprs = []
    for name, (kind, col) in expanded.items():
        pbuilder, _ = _SALTABLE[kind]
        c = _col(col) if col is not None else None
        partial_exprs.append(pbuilder(c).alias(name))

    phase1 = df.withColumn("_salt", salt).groupBy(*key, "_salt").agg(*partial_exprs)
    phase2 = phase1.groupBy(*key).agg(*[v.alias(k) for k, v in finals.items()])
    return phase2


def salted_count_distinct(
    df: DataFrame, key: list[str], col: str, out: str = "n_distinct"
) -> DataFrame:
    """EXACT distinct count that survives hot keys: shuffle once on
    (key, value) — the value component spreads a hot key's rows across
    reducers, no explicit salt needed — then count the deduped rows per
    key. Equals countDistinct exactly (tested)."""
    return (
        df.select(*key, col)
        .dropDuplicates([*key, col])
        .groupBy(*key)
        .agg(F.count(F.lit(1)).alias(out))
    )


# --- stats aggregators (lib/stats/aggregator analogues) -------------------------


def stats_aggregate(df: DataFrame, key: list[str], value: str, ts_col: str = "ts") -> DataFrame:
    """Running average / maximum / change-per-second per key
    (stats-average.c, stats-maximum.c, stats-change-per-second.c)."""
    span = F.greatest(
        F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)), F.lit(1)
    )
    return df.groupBy(*key).agg(
        F.avg(value).alias("avg_value"),
        F.max(value).alias("max_value"),
        F.count(F.lit(1)).alias("count"),
        (F.count(F.lit(1)) / span).alias("eps"),
    )


def metrics_probe(df: DataFrame, labels: list[str]) -> DataFrame:
    """metrics-probe() — labelled counters (modules/metrics-probe)."""
    return df.groupBy(*labels).agg(F.count(F.lit(1)).alias("value"))


def scope_keys(scope: str) -> list[str]:
    """Correlation scopes (correlation-key.h:29-40): which columns join
    the user key to identify a context."""
    return {
        "global": [],
        "host": ["host"],
        "program": ["host", "program"],
        "process": ["host", "program", "pid"],
    }[scope]


def iterate_rows(
    df: DataFrame,
    update,
    initial,
    order_by: str,
    partition_by: list[str],
    target: str = "iterated",
    value_type: str = "string",
):
    """Arbitrary-recurrence companion to the $(iterate) template function
    (tf-iterate.c): per partition, rows sorted by ``order_by`` get
    ``target`` = previous state, then state = update(state, row) — the
    generator's emit-then-advance order. ``update`` is a plain Python
    callable (state, row_namedtuple) -> state.

    Sequential by construction (same as the reference's mutex'd scalar);
    runs as applyInPandas per partition group, so distinct keys advance
    in parallel while each key's scan is ordered.
    """
    import pandas as pd  # noqa: PLC0415

    out_fields = df.schema.simpleString()[7:-1]  # struct<...> -> ...
    out_schema = f"{out_fields},{target} {value_type}"

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        state = initial
        vals = []
        for row in pdf.itertuples(index=False):
            vals.append(state)
            state = update(state, row)
        pdf[target] = vals
        return pdf

    return df.groupBy(*partition_by).applyInPandas(gen, schema=out_schema)


def sessionize_chunked(
    df: DataFrame,
    key: list[str],
    timeout: float,
    ts_col: str = "ts",
    chunk_seconds: int = 3600,
    session_col: str = "ctx_id",
) -> DataFrame:
    """Two-level sessionization: identical output partitioning to
    ``sessionize`` (tested), but the big window runs per (key, time
    chunk) so ONE pathologically hot key parallelizes across its time
    range instead of serializing one window partition — the hot-conv
    defusal the north rule asks for, applied to correlation contexts.

    Level 1: per (key, chunk) window marks local sessions. Level 2: the
    per-chunk SUMMARY (keys × chunks rows, tiny) decides which chunk-
    boundary sessions merge (gap across the boundary ≤ timeout) and
    assigns each chunk its global session offset via one cumulative sum;
    rows get offset + local_id - merged. Chains of merges work because a
    fully-merged single-session chunk contributes 0 to the offset.

    Pick ``chunk_seconds`` ≫ timeout (default 1 h); sessions longer than
    a chunk still merge correctly across every boundary they span.
    """
    e = F.unix_timestamp(F.col(ts_col))
    src = df.withColumn("_b", F.floor(e / chunk_seconds))
    w = W.partitionBy(*key, "_b").orderBy(F.col(ts_col))
    gap = e - F.lag(e).over(w)
    new_s = gap.isNull() | (gap > timeout)
    src = src.withColumn(
        "_loc", F.sum(new_s.cast("int")).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    summ = src.groupBy(*key, "_b").agg(
        F.max("_loc").alias("_n"),
        F.min(e).alias("_first"),
        F.max(e).alias("_last"),
    )
    ws = W.partitionBy(*key).orderBy("_b")
    prev_last = F.lag("_last").over(ws)
    summ = summ.withColumn(
        "_merge",
        (prev_last.isNotNull() & (F.col("_first") - prev_last <= timeout)).cast("int"),
    )
    offset_before = F.coalesce(
        F.sum(F.col("_n") - F.col("_merge")).over(
            ws.rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    summ = summ.withColumn("_off", offset_before).select(*key, "_b", "_off", "_merge")
    return (
        src.join(summ, [*key, "_b"])
        .withColumn(session_col, F.col("_off") + F.col("_loc") - F.col("_merge"))
        .drop("_b", "_loc", "_off", "_merge")
    )
