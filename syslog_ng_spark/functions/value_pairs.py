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

# Scope key-sets use the REFERENCE'S value names (value-pairs.c:71-78 —
# scopes emit the macro-style names: 'HOST', 'DATE', 'PRIORITY', …),
# pinned by lib/value-pairs/tests/test_value_pairs.c.
_VP_3164_NAMES = ["DATE", "FACILITY", "HOST", "MESSAGE", "PID", "PRIORITY", "PROGRAM"]
_VP_SELECTED_NAMES = [*_VP_3164_NAMES, "SEQNUM", "SOURCEIP", "TAGS"]
# builtins the reference stores as NV entries (part of the nv-pairs set)
_VP_NV_BUILTINS = [
    ("HOST", "host"), ("MESSAGE", "text"), ("MSGFORMAT", "syslog_format"),
    ("MSGID", "msgid"), ("PID", "pid"), ("PROGRAM", "program"),
]


def _macro_map(columns, names: list[str]) -> Column:
    """Map of macro-name → rendered value for every macro the frame can
    evaluate (macro_requires ⊆ columns)."""
    from .macros import macro, macro_requires  # noqa: PLC0415

    cols = set(columns)
    entries = []
    for n in names:
        if macro_requires(n) <= cols:
            entries += [F.lit(n), macro(n).cast("string")]
    if not entries:
        return F.create_map().cast("map<string,string>")
    return F.create_map(*entries)


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
        # non-dot NV entries + the builtins the reference stores as NV
        # values (HOST/MESSAGE/MSGFORMAT/MSGID/PID/PROGRAM — the C test's
        # nv-pairs key set)
        builtins = [
            x for name, col in _VP_NV_BUILTINS if col in columns
            for x in (F.lit(name), F.col(col).cast("string"))
        ]
        b = F.create_map(*builtins) if builtins else F.create_map().cast("map<string,string>")
        return F.map_concat(
            F.map_filter(_nv(columns), lambda k, _v: ~k.startswith(".")), b
        )
    if scope in ("dot-nv-pairs", "dot_nv_pairs"):
        # SDATA values ARE dot-named NV entries in the reference's data
        # model; here they live in the sdata column — merge them in
        return F.map_concat(
            F.map_filter(_nv(columns), lambda k, _v: k.startswith(".")),
            _scope_map(columns, "sdata"),
        )
    if scope in ("all-nv-pairs", "all_nv_pairs"):
        return F.map_concat(
            _scope_map(columns, "nv-pairs"), _scope_map(columns, "dot-nv-pairs")
        )
    if scope in ("rfc3164", "core", "base"):
        return _macro_map(columns, _VP_3164_NAMES)
    if scope in ("rfc5424", "syslog-proto"):
        return F.map_concat(
            _macro_map(columns, [*_VP_3164_NAMES, "MSGID"]),
            _scope_map(columns, "sdata"),
        )
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
    if scope == "selected-macros":
        return _macro_map(columns, _VP_SELECTED_NAMES)
    if scope == "all-macros":
        from .macros import macro_names  # noqa: PLC0415

        return _macro_map(columns, sorted(macro_names()))
    if scope == "everything":
        # all NV pairs + every evaluable macro (the C test's key set,
        # minus transport wire metadata SURVEY scopes out)
        return F.map_concat(
            _scope_map(columns, "all-nv-pairs"), _scope_map(columns, "all-macros")
        )
    raise ValueError(f"unknown value-pairs scope {scope!r}")


def _glob_pred(pattern: str):
    # fnmatch.translate end-anchors ('(?s:...)\Z') but does NOT start-
    # anchor, and rlike is a find — prepend '\A' so glob 'id' does not
    # match key 'sessionid' (reference: full-string g_pattern_match).
    rx = "\\A" + fnmatch.translate(pattern)
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
    # ±globs select from the SCOPE-sourced keys; explicit pairs are
    # direct vp_pairs and bypass both filters (test_value_pairs.c: a
    # pair stays in the set even when an exclude glob matches it)
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
    if pairs:
        from .templates import compile_template  # noqa: PLC0415

        entries = []
        for k, v in pairs.items():
            col = compile_template(v, set(df.columns)) if isinstance(v, str) else v
            entries += [F.lit(k), col.cast("string")]
        out = F.map_concat(out, F.create_map(*entries))
    if rekey is not None:
        out = rekey.apply(out)
    return df.withColumn(target, out)


def _any(conds: list[Column]) -> Column:
    c = conds[0]
    for x in conds[1:]:
        c = c | x
    return c


class Rekey:
    """Key transforms (lib/value-pairs/transforms.c), chainable.

    ``key_glob`` restricts every transform in this set to keys matching
    the glob (value_pairs_transform_set_new(glob) — the C transformer
    tests scope a set to e.g. '.SDATA.meta.*'); default '*' = all keys.
    """

    def __init__(self, key_glob: str = "*"):
        self._steps: list = []
        self._glob = key_glob

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

    def upper(self) -> "Rekey":
        self._steps.append(F.upper)
        return self

    def lower(self) -> "Rekey":
        self._steps.append(F.lower)
        return self

    def apply(self, m: Column) -> Column:
        guard = None if self._glob in ("*", None) else _glob_pred(self._glob)
        if guard is None:
            def mk(step):
                # exactly-2-arg lambda (transform_keys inspects the signature)
                return lambda k, _v: step(k)

            for step in self._steps:
                m = F.transform_keys(m, mk(step))
            return m
        # glob-scoped set: the match is decided ONCE on the incoming key,
        # then the whole chain applies (vp_transform_set semantics — a
        # per-step re-match would drop later transforms as soon as an
        # earlier one rewrote the key out of the glob)
        steps = list(self._steps)

        def chained(k, _v):
            t = k
            for step in steps:
                t = step(t)
            return F.when(guard(k), t).otherwise(k)

        return F.transform_keys(m, chained)


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
