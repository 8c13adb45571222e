"""Filter expressions: a boolean AST compiled to Spark Columns.

Mirrors the semantics of the reference's FilterExprNode tree
(/root/reference/lib/filter/filter-expr.h:37-49) — and/or/not, four
comparison modes (filter-cmp.c:43-257), regex/string/glob matchers
(logmatcher.h:38-53), facility/severity bitmask tests (filter-pri.c),
tag tests, CIDR netmask, in-list membership — re-expressed as Column
expressions so Catalyst short-circuits, folds constants, and pushes the
predicates into the parquet/Iceberg scan.

Filters compose with ``&``, ``|``, ``~`` like Columns; ``to_column()``
produces the Spark predicate.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import FACILITIES, SEVERITIES, facility_code, severity_code

# ---------------------------------------------------------------------------


def _as_col(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, FilterExpr):
        return v.to_column()
    if isinstance(v, str):
        return F.col(v)
    return F.lit(v)


def _as_val(v) -> Column:
    """Literal-or-column: strings are literals here (use F.col explicitly)."""
    return v if isinstance(v, Column) else F.lit(v)


class FilterExpr:
    """Base class. Subclasses implement ``to_column``."""

    def to_column(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def __and__(self, other) -> "FilterExpr":
        return FAnd(self, other)

    def __or__(self, other) -> "FilterExpr":
        return FOr(self, other)

    def __invert__(self) -> "FilterExpr":
        return FNot(self)


@dataclass
class FRaw(FilterExpr):
    """Wrap an arbitrary Column predicate (or SQL snippet via F.expr)."""

    col: Column | str

    def to_column(self) -> Column:
        return F.expr(self.col) if isinstance(self.col, str) else self.col


@dataclass
class FAnd(FilterExpr):
    """filter-op.c:88-128 — short-circuit AND (free via Catalyst)."""

    def __init__(self, *exprs):
        self.exprs = exprs

    def to_column(self) -> Column:
        out = _as_col(self.exprs[0])
        for e in self.exprs[1:]:
            out = out & _as_col(e)
        return out


@dataclass
class FOr(FilterExpr):
    def __init__(self, *exprs):
        self.exprs = exprs

    def to_column(self) -> Column:
        out = _as_col(self.exprs[0])
        for e in self.exprs[1:]:
            out = out | _as_col(e)
        return out


@dataclass
class FNot(FilterExpr):
    expr: object

    def to_column(self) -> Column:
        return ~_as_col(self.expr)


# --- comparisons (filter-cmp.c) ---------------------------------------------

_OPS = {"==", "!=", "<", "<=", ">", ">="}


def _apply_op(lhs: Column, rhs: Column, op: str) -> Column:
    return {
        "==": lhs == rhs,
        "!=": lhs != rhs,
        "<": lhs < rhs,
        "<=": lhs <= rhs,
        ">": lhs > rhs,
        ">=": lhs >= rhs,
    }[op]


@dataclass
class FCmp(FilterExpr):
    """Comparison in one of the reference's four modes.

    - ``string``   — compare the string representations (filter-cmp.c:292)
    - ``numeric``  — cast both to double (filter-cmp.c:43)
    - ``type_aware`` (default) — numeric when both sides parse as numbers,
      bytewise string compare otherwise (filter-cmp.c:189-235)
    - ``type_and_value`` — equal only when type class AND value agree
      (filter-cmp.c:239-257)
    """

    lhs: object
    rhs: object
    op: str = "=="
    mode: str = "type_aware"

    def to_column(self) -> Column:
        assert self.op in _OPS, self.op
        lhs, rhs = _as_val(self.lhs), _as_val(self.rhs)
        if self.mode == "string":
            return _apply_op(lhs.cast("string"), rhs.cast("string"), self.op)
        if self.mode == "numeric":
            return _apply_op(lhs.cast("double"), rhs.cast("double"), self.op)
        ln, rn = lhs.cast("double"), rhs.cast("double")
        both_num = ln.isNotNull() & rn.isNotNull()
        num_cmp = _apply_op(ln, rn, self.op)
        str_cmp = _apply_op(lhs.cast("string"), rhs.cast("string"), self.op)
        if self.mode == "type_aware":
            return F.when(both_num, num_cmp).otherwise(str_cmp)
        if self.mode == "type_and_value":
            # same type class required: both numeric or both non-numeric
            same_type = both_num | (ln.isNull() & rn.isNull())
            base = F.when(both_num, num_cmp).otherwise(str_cmp)
            if self.op == "!=":
                return ~same_type | base
            return same_type & base
        raise ValueError(f"unknown cmp mode {self.mode}")


# --- matchers (logmatcher.c / filter-re.c) -----------------------------------


def _glob_to_like(pattern: str) -> str:
    """Translate a shell glob to a SQL LIKE pattern (basic *, ? support)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


@dataclass
class FMatch(FilterExpr):
    """Regex / literal / glob match against a value.

    ``matcher``: ``pcre`` (→ Java regex via ``rlike``, JVM-side, analogous to
    the reference's PCRE-JIT default), ``string`` (literal), ``glob``.
    ``flags``: subset of {"substring", "prefix", "icase"} mirroring
    logmatcher.h:38-53. Literal matchers compile to ``contains``/
    ``startswith``/`==` — cheaper than regex, same trick the reference
    pulls with LogMatcherString.
    """

    value: object
    pattern: str
    matcher: str = "pcre"
    flags: frozenset = field(default_factory=frozenset)

    def to_column(self) -> Column:
        col = _as_col(self.value) if isinstance(self.value, (Column, str)) else _as_val(self.value)
        flags = set(self.flags)
        pat = self.pattern
        if self.matcher == "string":
            if "icase" in flags:
                col, pat = F.lower(col), pat.lower()
            if "substring" in flags:
                return col.contains(pat)
            if "prefix" in flags:
                return col.startswith(pat)
            return col == F.lit(pat)
        if self.matcher == "glob":
            if "icase" in flags:
                col, pat = F.lower(col), pat.lower()
            return col.like(_glob_to_like(pat))
        # pcre: anchor semantics = unanchored search (rlike), like the reference
        if "icase" in flags:
            pat = "(?i)" + pat
        if "prefix" in flags and not pat.startswith("^"):
            pat = "^" + pat
        return col.rlike(pat)


def host(pattern: str, **kw) -> FMatch:
    return FMatch(F.col("host"), pattern, **kw)


def program(pattern: str, **kw) -> FMatch:
    return FMatch(F.col("program"), pattern, **kw)


def message(pattern: str, **kw) -> FMatch:
    return FMatch(F.col("text"), pattern, **kw)


# --- priority filters (filter-pri.c:43-80) -----------------------------------


@dataclass
class FFacility(FilterExpr):
    """facility() — membership test on pri/8 given facility names."""

    names: tuple

    def __init__(self, *names: str):
        self.names = tuple(names)

    def to_column(self) -> Column:
        codes = [facility_code(n) for n in self.names]
        return (F.col("pri") / 8).cast("int").isin(codes)


@dataclass
class FSeverity(FilterExpr):
    """severity()/level() — names or 'a..b' ranges over pri%8.

    Lower severity code = more severe (emerg=0 .. debug=7), so the range
    'crit..emerg' covers codes 0..2, same as the reference grammar.
    """

    names: tuple

    def __init__(self, *names: str):
        self.names = tuple(names)

    def to_column(self) -> Column:
        codes: set[int] = set()
        for n in self.names:
            if ".." in n:
                a, b = n.split("..")
                lo, hi = sorted((severity_code(a), severity_code(b)))
                codes.update(range(lo, hi + 1))
            else:
                codes.add(severity_code(n))
        return F.pmod(F.col("pri"), F.lit(8)).isin(sorted(codes))


def facility_name_col(pri: Column) -> Column:
    arr = F.array(*[F.lit(x) for x in FACILITIES])
    return F.element_at(arr, ((pri / 8).cast("int") + 1))


def severity_name_col(pri: Column) -> Column:
    arr = F.array(*[F.lit(x) for x in SEVERITIES])
    return F.element_at(arr, (F.pmod(pri, F.lit(8)) + 1).cast("int"))


# --- tags (filter-tags.c) -----------------------------------------------------


@dataclass
class FTags(FilterExpr):
    """tags() — true when the row carries ANY of the given tags."""

    tags: tuple
    col: str = "tags"

    def __init__(self, *tags: str, col: str = "tags"):
        self.tags = tuple(tags)
        self.col = col

    def to_column(self) -> Column:
        return F.arrays_overlap(
            F.coalesce(F.col(self.col), F.array().cast("array<string>")),
            F.array(*[F.lit(t) for t in self.tags]),
        )


# --- netmask (filter-netmask.c) ----------------------------------------------


def ip_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 string → int64, JVM-side (no UDF)."""
    parts = F.split(col, r"\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


@dataclass
class FNetmask(FilterExpr):
    """netmask('10.0.0.0/8') on an IPv4 string column → int64 range test.

    The CIDR bounds fold to constants at plan time, so the test is two
    long comparisons — pushdown-friendly, unlike a UDF.
    """

    cidr: str
    value: object = "src_ip"

    def to_column(self) -> Column:
        net = ipaddress.ip_network(self.cidr, strict=False)
        lo, hi = int(net.network_address), int(net.broadcast_address)
        ipcol = ip_to_long(_as_col(self.value))
        return ipcol.between(lo, hi)


# --- in-list (filter-in-list.c:38-93) ----------------------------------------


@dataclass
class FInList(FilterExpr):
    """in-list(file, value) — membership against a newline-delimited file
    or an in-memory list. Small sets fold into ``isin`` (Catalyst turns big
    ones into a hash set); for very large lists prefer a broadcast
    semi-join at the DataFrame level (see enrich.in_list_semi_join).
    """

    values: object  # list[str] | str path
    value: object = "text"

    def to_column(self) -> Column:
        vals = self.values
        if isinstance(vals, str):
            with open(vals) as fh:
                vals = [line.strip() for line in fh if line.strip()]
        return _as_col(self.value).isin(list(vals))


# --- named filter registry (filter-call.c) ------------------------------------

_REGISTRY: dict[str, FilterExpr] = {}


def define_filter(name: str, expr: FilterExpr) -> None:
    _REGISTRY[name] = expr


@dataclass
class FCall(FilterExpr):
    name: str

    def to_column(self) -> Column:
        return _REGISTRY[self.name].to_column()


@dataclass
class FBlank(FilterExpr):
    """filter-blank.c — true when the value is empty/whitespace/null."""

    value: object = "text"

    def to_column(self) -> Column:
        c = _as_col(self.value)
        return c.isNull() | (F.length(F.trim(c)) == 0)


# --- IPv6 (filter-netmask6.c) --------------------------------------------------

import pandas as _pd  # noqa: E402
from pyspark.sql import functions as _F  # noqa: E402
from pyspark.sql import types as _T  # noqa: E402


@_F.pandas_udf(
    _T.StructType(
        [_T.StructField("hi", _T.LongType()), _T.StructField("lo", _T.LongType())]
    )
)
def _ipv6_to_longs(s: _pd.Series) -> _pd.DataFrame:
    """IPv6 string → (hi, lo) signed-int64 pair; null on parse failure.
    Vectorized Arrow UDF — :: compression makes a pure-Column parse
    impractical; the result is plain longs so the range test itself stays
    JVM-side and pushdown-friendly."""

    def one(v):
        if v is None:
            return (None, None)
        try:
            n = int(ipaddress.IPv6Address(v))
        except (ipaddress.AddressValueError, ValueError):
            return (None, None)
        hi, lo = n >> 64, n & ((1 << 64) - 1)
        tos = lambda x: x - (1 << 64) if x >= (1 << 63) else x  # noqa: E731
        return (tos(hi), tos(lo))

    return _pd.DataFrame(s.map(one).tolist(), columns=["hi", "lo"])


@dataclass
class FNetmask6(FilterExpr):
    """netmask6('2001:db8::/32') on an IPv6 string column: decompose to
    two signed longs once, compare lexicographically against the network
    bounds (constants folded at plan time)."""

    cidr: str
    value: object = "src_ip"

    def to_column(self) -> Column:
        net = ipaddress.ip_network(self.cidr, strict=False)
        lo_n, hi_n = int(net.network_address), int(net.broadcast_address)

        def split(n: int) -> tuple[int, int]:
            h, l = n >> 64, n & ((1 << 64) - 1)
            tos = lambda x: x - (1 << 64) if x >= (1 << 63) else x  # noqa: E731
            return tos(h), tos(l)

        lo_hi, lo_lo = split(lo_n)
        hi_hi, hi_lo = split(hi_n)
        pair = _ipv6_to_longs(_as_col(self.value))
        h, l = pair["hi"], pair["lo"]
        # unsigned lexicographic compare on signed longs: flip the sign
        # bit by XOR with MIN_LONG so ordering matches unsigned order
        MIN = -(1 << 63)
        uh, ul = h.bitwiseXOR(MIN), l.bitwiseXOR(MIN)

        def upair(hi_v: int, lo_v: int):
            return hi_v ^ MIN, lo_v ^ MIN

        lo_uh, lo_ul = upair(lo_hi, lo_lo)
        hi_uh, hi_ul = upair(hi_hi, hi_lo)
        ge_lo = (uh > lo_uh) | ((uh == lo_uh) & (ul >= lo_ul))
        le_hi = (uh < hi_uh) | ((uh == hi_uh) & (ul <= hi_ul))
        return h.isNotNull() & ge_lo & le_hi
