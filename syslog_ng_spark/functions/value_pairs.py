"""value-pairs: declarative NV-pair subset selection + rekeying.

Mirrors /root/reference/lib/value-pairs/value-pairs.c — scopes
(value-pairs.c:71-78,126-136), ±glob patterns, and the rekey transforms
add-prefix / shift / shift-levels / replace-prefix
(lib/value-pairs/transforms.c) — as pure map-column algebra
(map_filter / transform_keys / map_concat), fully JVM-side.

The `map-value-pairs()` parser (modules/map-value-pairs) is the same
machinery applied back onto the nv column.
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scope name → builder(df) -> map<string,string> Column
_BUILTIN_COLS_3164 = ["host", "program", "pid", "text", "pri"]
_BUILTIN_COLS_5424 = [*_BUILTIN_COLS_3164, "msgid"]


def _cols_to_map(columns, cols: list[str]) -> Column:
    entries = []
    for c in cols:
        if c in columns:
            entries += [F.lit(c), F.col(c).cast("string")]
    if not entries:
        return F.create_map().cast("map<string,string>")
    return F.create_map(*entries)


def _nv(columns) -> Column:
    if "nv" in columns:
        return F.coalesce(F.col("nv"), F.create_map().cast("map<string,string>"))
    return F.create_map().cast("map<string,string>")


def _scope_map(df_or_columns, scope: str) -> Column:
    """Scope → map column. Accepts a DataFrame or a COLUMN-NAME list —
    the builders only need the schema's names, which lets template
    functions ($(format-json --scope ...)) reuse scopes with just the
    compile-time column set."""
    df = df_or_columns
    columns = list(df.columns) if isinstance(df, DataFrame) else list(df)
    if scope in ("nv-pairs", "nv_pairs"):
        return F.map_filter(_nv(columns), lambda k, _v: ~k.startswith("."))
    if scope in ("dot-nv-pairs", "dot_nv_pairs"):
        return F.map_filter(_nv(columns), lambda k, _v: k.startswith("."))
    if scope == "rfc3164" or scope == "core":
        return _cols_to_map(columns, _BUILTIN_COLS_3164)
    if scope in ("rfc5424", "syslog-proto"):
        return _cols_to_map(columns, _BUILTIN_COLS_5424)
    if scope == "sdata":
        if "sdata" in columns:
            # syslog_parser emits reference-named keys (.SDATA.id.param)
            # already; prefix only keys from other producers
            return F.coalesce(
                F.transform_keys(
                    F.col("sdata"),
                    lambda k, _v: F.when(
                        k.startswith(".SDATA."), k
                    ).otherwise(F.concat(F.lit(".SDATA."), k)),
                ),
                F.create_map().cast("map<string,string>"),
            )
        return F.create_map().cast("map<string,string>")
    if scope in ("all-macros", "selected-macros"):
        from .macros import macro  # noqa: PLC0415

        names = ["FACILITY", "SEVERITY", "TAGS"] if scope == "selected-macros" else [
            "FACILITY", "SEVERITY", "TAGS", "ISODATE", "YEAR", "MONTH", "DAY",
        ]
        entries = []
        for n in names:
            try:
                entries += [F.lit(n), macro(n).cast("string")]
            except Exception:  # noqa: BLE001 — macro needs absent column
                continue
        return F.create_map(*entries) if entries else F.create_map().cast("map<string,string>")
    if scope == "everything":
        return F.map_concat(
            _cols_to_map(columns, [c for c in columns if c != "nv"]),
            _nv(columns),
        )
    raise ValueError(f"unknown value-pairs scope {scope!r}")


def _glob_pred(pattern: str):
    rx = fnmatch.translate(pattern)
    # fnmatch translates to a fully-anchored Python regex; Java accepts it
    return lambda k: k.rlike(rx)


def value_pairs(
    df: DataFrame,
    scopes: list[str] | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    pairs: dict[str, Column | str] | None = None,
    rekey: "Rekey | None" = None,
    target: str = "vp",
) -> DataFrame:
    """Build a map column from the selected scopes ± glob patterns.

    ``pairs`` adds explicit (name, template/Column) pairs like the
    reference's pair() option. Later scopes win on key conflicts
    (map_concat under LAST_WIN dedup policy).
    """
    out = F.create_map().cast("map<string,string>")
    for s in scopes or []:
        out = F.map_concat(out, _scope_map(df, s))
    if pairs:
        from .templates import compile_template  # noqa: PLC0415

        entries = []
        for k, v in pairs.items():
            col = compile_template(v, set(df.columns)) if isinstance(v, str) else v
            entries += [F.lit(k), col.cast("string")]
        out = F.map_concat(out, F.create_map(*entries))
    if include:
        preds = [_glob_pred(p) for p in include]
        out = F.map_filter(
            out,
            lambda k, _v: _any([p(k) for p in preds]),
        )
    if exclude:
        preds = [_glob_pred(p) for p in exclude]
        out = F.map_filter(
            out,
            lambda k, _v: ~_any([p(k) for p in preds]),
        )
    if rekey is not None:
        out = rekey.apply(out)
    return df.withColumn(target, out)


def _any(conds: list[Column]) -> Column:
    c = conds[0]
    for x in conds[1:]:
        c = c | x
    return c


class Rekey:
    """Key transforms (lib/value-pairs/transforms.c), chainable."""

    def __init__(self):
        self._steps: list = []

    def add_prefix(self, prefix: str) -> "Rekey":
        self._steps.append(lambda k: F.concat(F.lit(prefix), k))
        return self

    def shift(self, n: int) -> "Rekey":
        self._steps.append(lambda k: F.substring(k, n + 1, 1 << 30))
        return self

    def shift_levels(self, n: int) -> "Rekey":
        # drop the first n dot-separated levels
        self._steps.append(
            lambda k: F.array_join(F.slice(F.split(k, r"\."), n + 1, 1 << 10), ".")
        )
        return self

    def replace_prefix(self, old: str, new: str) -> "Rekey":
        self._steps.append(
            lambda k: F.when(
                k.startswith(old),
                F.concat(F.lit(new), F.substring(k, len(old) + 1, 1 << 30)),
            ).otherwise(k)
        )
        return self

    def apply(self, m: Column) -> Column:
        def mk(step):
            # exactly-2-arg lambda (transform_keys inspects the signature)
            return lambda k, _v: step(k)

        for step in self._steps:
            m = F.transform_keys(m, mk(step))
        return m


def map_value_pairs(
    df: DataFrame,
    renames: dict[str, str] | None = None,
    copies: dict[str, str] | None = None,
    nv_col: str = "nv",
) -> DataFrame:
    """map-value-pairs() parser (modules/map-value-pairs): bulk
    rename/copy of NV keys. Globs in ``renames`` keys are supported
    (expanded against nothing at plan time — exact keys only for globs
    would need the runtime keyset, so use Rekey for pattern renames)."""
    m = F.coalesce(F.col(nv_col), F.create_map().cast("map<string,string>"))
    if renames:
        rename_map = F.create_map(*[x for k, v in renames.items() for x in (F.lit(k), F.lit(v))])
        m = F.transform_keys(m, lambda k, _v: F.coalesce(rename_map[k], k))
    if copies:
        for src, dst in copies.items():
            m = F.when(
                F.element_at(m, src).isNotNull(),
                F.map_concat(m, F.create_map(F.lit(dst), F.element_at(m, src))),
            ).otherwise(m)
    return df.withColumn(nv_col, m)
