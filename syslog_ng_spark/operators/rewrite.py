"""Rewrites: row mutations (SURVEY.md §2.6).

Each rewrite mirrors one reference operator (lib/rewrite/*) and supports
the common ``condition=`` guard (rewrite-expr.h:37,46): when the guard is
false the row passes through unchanged — expressed as ``F.when`` so the
whole rewrite stays a single projection, no branching in the plan.

The original ``text`` column is never mutated by convention (per-turn
text-equality invariant); rewrites target derived columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.filters import FilterExpr
from ..schema import SEVERITY_CODE, facility_code, severity_code


def _cond(condition) -> Column | None:
    if condition is None:
        return None
    if isinstance(condition, FilterExpr):
        return condition.to_column()
    return condition


def _guarded(df: DataFrame, name: str, new: Column, condition) -> DataFrame:
    c = _cond(condition)
    if c is not None:
        # untyped NULL: coerces to new's type (typed set() must not
        # silently stringify through the when/otherwise common type)
        old = F.col(name) if name in df.columns else F.lit(None)
        new = F.when(c, new).otherwise(old)
    return df.withColumn(name, new)


def set_value(
    df: DataFrame, name: str, value: Column | str, condition=None,
    on_error: str = "drop-property",
) -> DataFrame:
    """set(template value(name)) — rewrite-set.c:49-61. ``value`` may be a
    Column or a template string (compiled via the template compiler;
    syslog-ng 4 type hints like ``int(10)`` and bare numeric literals
    produce a TYPED column — pass ``string(...)`` to force text).
    ``on_error`` (template-options on-error): drop-property → cast
    failures store NULL (default), fallback-to-string → keep the
    original text, drop-message → drop rows whose cast failed."""
    if isinstance(value, str):
        from ..functions.templates import (  # noqa: PLC0415
            compile_typed_template,
            parse_on_error,
        )

        mode = parse_on_error(on_error)
        raw_value = value
        value = compile_typed_template(value, set(df.columns), on_error)
        if mode == "drop-message":
            from ..functions.templates import compile_template  # noqa: PLC0415

            raw = compile_template(raw_value, set(df.columns))
            # a cast failure is typed-NULL while the raw render is
            # non-empty — those rows drop (ON_ERROR_DROP_MESSAGE)
            df = df.filter(value.isNotNull() | (F.coalesce(raw, F.lit("")) == ""))
    return _guarded(df, name, value, condition)


def subst(
    df: DataFrame,
    pattern: str,
    replacement: str,
    value: str,
    global_: bool = False,
    condition=None,
    matcher: str = "pcre",
    flags: frozenset | set = frozenset(),
) -> DataFrame:
    """subst(regex, replacement) — rewrite-subst.c:50-99.

    The reference replaces only the FIRST occurrence unless flags(global);
    Spark's regexp_replace is global, so first-only is expressed by
    rewriting just the first match span using regexp_instr/substr.

    ``matcher='string'`` selects the literal matcher (log-matcher.c
    LogMatcherString, modes pinned by lib/tests/test_matcher.c):
    default = whole-value equality, ``flags={'prefix'}`` replaces a
    matching prefix, ``{'substring'}`` the first (or, with ``global_``,
    every) literal occurrence; ``'icase'`` composes with each.
    """
    col = F.col(value)
    flags = frozenset(flags)
    if matcher == "string":
        icase = "icase" in flags
        hay = F.lower(col) if icase else col
        needle = pattern.lower() if icase else pattern
        plen = len(pattern)
        if "prefix" in flags:
            new = F.when(
                hay.startswith(needle),
                F.concat(F.lit(replacement), F.substring(col, plen + 1, 1 << 30)),
            ).otherwise(col)
        elif "substring" in flags:
            if global_:
                # literal-global: \Q...\E-quoted regex (+ (?i) for icase)
                quoted = "\\Q" + pattern.replace("\\E", "\\E\\\\E\\Q") + "\\E"
                new = F.regexp_replace(
                    col, ("(?i)" if icase else "") + quoted,
                    replacement.replace("\\", "\\\\").replace("$", "\\$"),
                )
            else:
                pos = F.instr(hay, needle)
                new = F.when(
                    pos > 0,
                    F.concat(
                        F.substring(col, 1, pos - 1),
                        F.lit(replacement),
                        F.substring(col, pos + plen, 1 << 30),
                    ),
                ).otherwise(col)
        else:  # whole-value equality
            new = F.when(hay == needle, F.lit(replacement)).otherwise(col)
        return _guarded(df, value, new, condition)
    if global_:
        new = F.regexp_replace(col, pattern, replacement)
    else:
        # first-only: find the first match span, re-apply the pattern
        # ANCHORED to exactly that span (prefix/tail untouched). The
        # anchored re-match keeps $N backrefs working and — unlike
        # running a global replace over the head — cannot also replace
        # a trailing zero-width match inside the span ('aa|b*' on 'aa'
        # must yield one '@', not '@@'; test_matcher.c empty_global).
        pos = F.regexp_instr(col, F.lit(pattern))  # 1-based match start
        first = F.regexp_extract(col, pattern, 0)
        head_end = pos - 1 + F.length(first)
        prefix_part = F.substring(col, 1, (pos - 1).cast("int"))
        tail = F.substring(
            col, (head_end + 1).cast("int"), (1 << 30)
        )
        replaced_span = F.regexp_replace(
            first, f"(?s)^(?:{pattern})$", replacement
        )
        new = F.when(
            pos > 0, F.concat(prefix_part, replaced_span, tail)
        ).otherwise(col)
    return _guarded(df, value, new, condition)


def unset(df: DataFrame, *names: str, condition=None) -> DataFrame:
    """unset() — rewrite-unset.c. Null out (or drop) columns / nv keys."""
    out = df
    for n in names:
        if "." in n and "nv" in df.columns and n not in df.columns:
            out = out.withColumn(
                "nv", F.map_filter(F.col("nv"), lambda k, _v: k != F.lit(n))
            )
        else:
            typ = dict(df.dtypes).get(n, "string")
            out = _guarded(out, n, F.lit(None).cast(typ), condition)
    return out


def groupunset(df: DataFrame, glob: str) -> DataFrame:
    """groupunset(glob) — null every matching column (rewrite-groupset.c)."""
    import fnmatch  # noqa: PLC0415

    out = df
    for n, typ in df.dtypes:
        if fnmatch.fnmatch(n, glob):
            out = out.withColumn(n, F.lit(None).cast(typ))
    return out


def groupset(df: DataFrame, glob: str | list[str], value: Column | str) -> DataFrame:
    """groupset(value values(globs...)) — set every matching column
    (rewrite-groupset.c). In a string template, ``$_`` binds to the
    column's OLD value per target ("$_ alma" appends ' alma' to each
    matched field — lib/rewrite/tests/test_rewrite.c group_set cases);
    ``glob`` accepts one pattern or a list (values("f1" "f2"))."""
    import fnmatch  # noqa: PLC0415

    globs = [glob] if isinstance(glob, str) else list(glob)
    out = df
    for n, _typ in df.dtypes:
        if not any(fnmatch.fnmatch(n, g) for g in globs):
            continue
        if isinstance(value, str) and "$_" in value:
            from ..functions import templates as TPL  # noqa: PLC0415

            TPL._BINDINGS.append({"_": F.col(n).cast("string")})
            try:
                v = TPL.compile_template(value, set(df.columns))
            finally:
                TPL._BINDINGS.pop()
            out = set_value(out, n, v)
        else:
            out = set_value(out, n, value)
    return out


def rename(df: DataFrame, old: str, new: str) -> DataFrame:
    """rename() — lib/rewrite/rewrite-rename.c."""
    return df.withColumnRenamed(old, new)


def set_tag(
    df: DataFrame, tag: str | Column, condition=None, tags_col: str = "tags"
) -> DataFrame:
    """set-tag(template) — rewrite-set-tag.c; tag may be templated."""
    t = F.lit(tag) if isinstance(tag, str) else tag
    cur = (
        F.coalesce(F.col(tags_col), F.array().cast("array<string>"))
        if tags_col in df.columns
        else F.array().cast("array<string>")
    )
    new = F.array_union(cur, F.array(t))
    c = _cond(condition)
    if c is not None:
        new = F.when(c, new).otherwise(cur)
    return df.withColumn(tags_col, new)


def clear_tag(
    df: DataFrame, tag: str, condition=None, tags_col: str = "tags"
) -> DataFrame:
    cur = F.coalesce(F.col(tags_col), F.array().cast("array<string>"))
    new = F.array_remove(cur, tag)
    c = _cond(condition)
    if c is not None:
        new = F.when(c, new).otherwise(cur)
    return df.withColumn(tags_col, new)


def set_severity(df: DataFrame, severity: str | Column, condition=None) -> DataFrame:
    """set-severity() — keeps facility bits, swaps pri%8 (rewrite-set-severity.c)."""
    if isinstance(severity, str):
        sev = F.lit(severity_code(severity))
    else:  # templated/numeric column: accept name or number
        sev_map = F.create_map(
            *[x for k, v in SEVERITY_CODE.items() for x in (F.lit(k), F.lit(v))]
        )
        sev = F.coalesce(
            severity.cast("int"), sev_map[F.lower(severity)]
        )
    new = ((F.col("pri") / 8).cast("int") * 8 + sev).cast("int")
    return _guarded(df, "pri", new, condition)


def set_facility(df: DataFrame, facility: str, condition=None) -> DataFrame:
    new = (
        F.lit(facility_code(facility) * 8) + F.pmod(F.col("pri"), F.lit(8))
    ).cast("int")
    return _guarded(df, "pri", new, condition)


def set_pri(df: DataFrame, pri: Column | int, condition=None) -> DataFrame:
    """set-pri() — rewrite-set-pri.c log_rewrite_set_pri_convert_pri:
    the rendered value must be a whole strtol-style decimal (optional
    leading whitespace and sign, nothing after the digits) within
    [0, 127*8+7]; anything else keeps the old pri (the light set-pri
    table: '5789'/'-2'/'test'/'' all leave pri untouched)."""
    src = (F.lit(pri) if isinstance(pri, int) else pri).cast("string")
    num = F.when(
        src.rlike(r"^\s*[+-]?[0-9]+$"),
        F.regexp_replace(src, r"\s", "").cast("long"),
    )
    new = (
        F.when((num >= 0) & (num <= 127 * 8 + 7), num.cast("int"))
        .otherwise(F.col("pri"))
    )
    return _guarded(df, "pri", new, condition)


def set_matches(df: DataFrame, source: str, matches_col: str = "matches") -> DataFrame:
    """set-matches() — load $1.. from a list value; $0 becomes UNSET
    (rewrite-set-matches.c + lib/rewrite/tests/test_set_matches.c:
    list items land in match slots 1.., slot 0 is cleared). The matches
    array is $0-first, so a null leads."""
    return df.withColumn(
        matches_col,
        F.concat(F.array(F.lit(None).cast("string")), F.split(F.col(source), ",")),
    )


def unset_matches(df: DataFrame, matches_col: str = "matches") -> DataFrame:
    """unset-matches() — clear every match slot (test_set_matches.c
    unset_matches case)."""
    return df.withColumn(matches_col, F.lit(None).cast("array<string>"))


def fix_timezone(df: DataFrame, tz: str, ts_col: str = "ts") -> DataFrame:
    """fix-timezone() — reinterpret the wall-clock fields in tz
    (modules/timestamp/rewrite-fix-timezone.c): same local time, new zone."""
    return df.withColumn(ts_col, F.to_utc_timestamp(F.col(ts_col), tz))


def set_timezone(df: DataFrame, tz: str, ts_col: str = "ts") -> DataFrame:
    """set-timezone() — convert the instant into tz's wall-clock."""
    return df.withColumn(ts_col, F.from_utc_timestamp(F.col(ts_col), tz))


# Per-brand PAN patterns, in the reference's application order
# (scl/rewrite/cc-mask.conf:81-88: visa, mastercard, amex, jcb, diners,
# discover; brand regexes at cc-mask.conf:52-77). Each entry is
# (full-match pattern, mask pattern) where the mask pattern captures
# first-6 / last-4 — the reference's "$(substr $0 0 6)******$(substr $0
# -4 4)" template re-expressed as capture groups. Java substitutes ""
# for unmatched groups, so alternation-coupled groups concat cleanly.
_CC_BRANDS: list[tuple[str, str, str]] = [
    ("visa", r"4[0-9]{12}(?:[0-9]{3})?",
     r"(4[0-9]{5})(?:[0-9]{6}|[0-9]{3})([0-9]{4})"),
    ("mastercard",
     r"(?:5[1-5][0-9]{2}|222[1-9]|22[3-9][0-9]|2[3-6][0-9]{2}"
     r"|27[01][0-9]|2720)[0-9]{12}",
     r"((?:5[1-5][0-9]{2}|222[1-9]|22[3-9][0-9]|2[3-6][0-9]{2}"
     r"|27[01][0-9]|2720)[0-9]{2})(?:[0-9]{6})([0-9]{4})"),
    ("amex", r"3[47][0-9]{13}",
     r"(3[47][0-9]{4})(?:[0-9]{5})([0-9]{4})"),
    ("jcb", r"(?:2131|1800|35[0-9]{3})[0-9]{11}",
     r"(?:((?:2131|1800)[0-9]{2})[0-9]{5}|(35[0-9]{4})[0-9]{6})([0-9]{4})"),
    ("diners", r"3(?:0[0-5]|[68][0-9])[0-9]{11}",
     r"(3(?:0[0-5]|[68][0-9])[0-9]{3})(?:[0-9]{4})([0-9]{4})"),
    ("discover", r"6(?:011|5[0-9]{2})[0-9]{12}",
     r"(6(?:011|5[0-9]{2})[0-9]{2})(?:[0-9]{6})([0-9]{4})"),
]


def credit_card_mask(df: DataFrame, source: str, target: str | None = None) -> DataFrame:
    """credit-card-mask SCL preset (scl/rewrite/cc-mask.conf:81): chain
    of per-brand global substs, each masking to first-6 + "******" +
    last-4 (output is always 16 chars even for 13-15 digit PANs, per
    the reference's fixed substr template). The 6-regex chain runs only
    on rows containing a 13+ digit run (the shortest PAN) — CASE WHEN
    branches evaluate lazily per row, so PAN-free logs pay one cheap
    DFA scan instead of six brand regexes."""
    col = F.col(source)
    masked = col
    for name, _, mask_pat in _CC_BRANDS:
        repl = r"$1$2******$3" if name == "jcb" else r"$1******$2"
        masked = F.regexp_replace(masked, mask_pat, repl)
    out = F.when(col.rlike(r"[0-9]{13}"), masked).otherwise(col)
    return df.withColumn(target or source, out)


_CC_SENTINEL = "\x1e"  # RS control char; never in log text (same
# caveat class as the packed-regexp sentinel in operators/parsers.py)


def credit_card_hash(df: DataFrame, source: str, target: str | None = None) -> DataFrame:
    """credit-card-hash SCL preset (scl/rewrite/cc-mask.conf:91):
    replace each PAN with $(sha1 --length 16 $0). regexp_replace cannot
    compute over the matched text, so each brand pass wraps matches in
    a sentinel, splits, hashes the odd (match) slots with JVM sha1, and
    rejoins — still pure Column HOFs, no UDF, no shuffle."""
    col = F.col(source)
    hashed_col = col
    for _, full_pat, _ in _CC_BRANDS:
        marked = F.regexp_replace(
            hashed_col, f"({full_pat})", f"{_CC_SENTINEL}$1{_CC_SENTINEL}"
        )
        parts = F.split(marked, _CC_SENTINEL)
        hashed = F.transform(
            parts,
            lambda x, i: F.when(
                i % 2 == 1, F.substring(F.sha1(x.cast("binary")), 1, 16)
            ).otherwise(x),
        )
        hashed_col = F.array_join(hashed, "")
    # same cheap 13-digit-run prefilter as credit_card_mask
    out = F.when(col.rlike(r"[0-9]{13}"), hashed_col).otherwise(col)
    return df.withColumn(target or source, out)


def guess_timezone(
    df,
    ts_col: str = "ts",
    ref_col: str = "recvd_ts",
    target: str | None = None,
    step_minutes: int = 30,
):
    """guess-timezone() (modules/timestamp/tzinfo &
    timestamp-rewrite guess-timezone): a timestamp parsed with a wrong or
    missing zone is shifted by the candidate UTC offset (±14 h in
    ``step_minutes`` steps) that lands it closest to the reference time
    (receive time) — the reference's 'assume the message is recent'
    heuristic.

    Pure Column arithmetic: build the candidate array once, array_sort by
    |adjusted - ref| and take the head — no UDF, no shuffle.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    target = target or ts_col
    ts_s = F.unix_timestamp(F.col(ts_col))
    ref_s = F.unix_timestamp(F.col(ref_col))
    offsets = list(range(-14 * 3600, 14 * 3600 + 1, step_minutes * 60))
    cands = F.array(
        *[
            F.struct(
                F.abs(ts_s + o - ref_s).alias("d"),
                F.lit(o).alias("o"),
            )
            for o in offsets
        ]
    )
    best = F.element_at(F.array_sort(cands), 1)["o"]
    # materialize the offset BEFORE overwriting ts_col — a lazy Column
    # would re-resolve against the already-adjusted timestamp
    out = df.withColumn("tz_guess_offset", best)
    return out.withColumn(
        target,
        F.timestamp_seconds(
            F.unix_timestamp(F.col(ts_col)) + F.col("tz_guess_offset")
        ),
    )
