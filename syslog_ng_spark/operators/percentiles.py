"""Per-group distribution statistics: exact and approximate percentiles
over a numeric column (document length, token count, quality score).

Every curation decision that says "drop the bottom X%" or "cap documents
above the p99 length" needs the per-group length/score distribution
first. The reference's stats analogue is its aggregator family
(avg/max/EPS over a message stream, operators/grouping.py:258); this is
the corpus-curation instance over arbitrary numeric columns with the
quantile family added.

Scale story — the reason BOTH modes exist:
- ``exact`` uses Spark's ``percentile`` aggregate: correct to the last
  bit (linear interpolation over the sorted group, the same definition
  DuckDB's ``quantile_cont`` uses — the gate relies on that), but it
  buffers every value of a group in executor memory. Fine when groups
  are bounded (languages, sources: each group's values fit); WRONG for
  100 TB single-group or per-domain skew.
- ``approx`` uses ``percentile_approx`` (Greenwald-Khanna style sketch):
  bounded memory per group regardless of group size — error is bounded
  by ``1/accuracy`` in RANK space, i.e. the returned value's rank is
  within n/accuracy of the true rank (pinned by an accuracy test, not
  the oracle gate). At 100 TB this is the only safe default; the sketch
  merges associatively so the plan is the ordinary two-phase partial →
  final aggregate with no extra exchange.

Both modes are ONE hash exchange (map-side partial aggregation); the
percentile list is evaluated in a single aggregate pass, not one pass
per quantile.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_percentiles", "percentile_labels"]


def percentile_labels(percentiles: Sequence[float]) -> list[str]:
    """Stable column names: 0.5 → p50, 0.99 → p99, 0.999 → p99_9."""
    out = []
    for p in percentiles:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile out of [0,1]: {p}")
        s = f"{p * 100:g}".replace(".", "_")
        out.append(f"p{s}")
    if len(set(out)) != len(out):
        raise ValueError(f"duplicate percentile labels: {out}")
    return out


def group_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    percentiles: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    mode: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group ``n / mean / min / max`` + one column per requested
    percentile of ``value_col``.

    ``mode='exact'``: bit-exact interpolated percentiles (groups must
    fit executor memory — bounded-cardinality groups only).
    ``mode='approx'``: percentile_approx sketch, rank error ≤
    n/``accuracy``, safe at any group size — the 100-TB default.
    Empty ``group_cols`` gives the global distribution (still one
    partial→final aggregate; the final single-row reduce is the one
    unavoidable gather).
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    labels = percentile_labels(percentiles)
    v = F.col(value_col)
    pcts = F.array(*[F.lit(float(p)) for p in percentiles])
    if mode == "exact":
        parr = F.percentile(v, pcts)
    else:
        parr = F.percentile_approx(v, pcts, F.lit(int(accuracy)))
    aggs = [
        F.count(v).alias("n"),
        F.avg(v).cast("double").alias("mean"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        *[
            parr.getItem(i).cast("double").alias(lbl)
            for i, lbl in enumerate(labels)
        ],
    ]
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(*aggs)
