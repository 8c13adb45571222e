"""Template compiler: ``"pre $HOST ${nv.key} $(func a b) post"`` → Column.

The reference compiles template strings into a list of
{literal, macro/value ref, function call} elements and evaluates them per
message (/root/reference/lib/template/compiler.c, repr.h:34-36, eval.c).
Here compilation happens once at plan time and produces a single
``concat`` Column — evaluation is whole-stage-codegen'd by Tungsten, no
per-row interpretation at all.

Value resolution order for ``$NAME``/``${name}``:
1. known macro (macros.py)
2. top-level DataFrame column
3. entry in the ``nv`` map column (dynamic name-value analogue)
Numbered refs ``$1..$255`` read the ``matches`` array column
(regexp capture slots, logmsg.h:282).

Template functions ($(...)) come from a registry mirroring
modules/basicfuncs/basic-funcs.c:76-150; args are recursively compiled
templates, so ``$(lowercase $HOST)`` works.
"""

from __future__ import annotations

import re
import shlex

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import MATCHES_COL, NV_COL
from .macros import is_macro, macro

_TOKEN = re.compile(
    r"""\$\$            # escaped dollar
      | \$\{[^}]+\}     # ${name}
      | \$\(            # $( function-call opener (args scanned manually)
      | \$[0-9]+        # $1..$n match refs
      | \$[A-Za-z_][A-Za-z0-9_]*  # $NAME
    """,
    re.X,
)


# lambda-variable bindings for $(map)/$(filter) element templates ($_)
_BINDINGS: list[dict[str, Column]] = []


def _resolve_name(name: str, columns: set[str] | None) -> Column:
    for scope in reversed(_BINDINGS):
        if name in scope:
            return scope[name]
    if name.isdigit():
        # $0..$n → matches array (1-based element_at; $0 = whole match at idx 1)
        return F.element_at(F.col(MATCHES_COL), int(name) + 1)
    if is_macro(name):
        return macro(name)
    if columns is not None:
        if name in columns:
            return F.col(name)
        return F.element_at(F.col(NV_COL), name)
    # no column-set hint: dotted names are NVTable entries (dot-notation
    # keys live in the nv map, not as top-level columns)
    if "." in name:
        return F.element_at(F.col(NV_COL), name)
    return F.col(name)


def _find_call_end(s: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start`` (nesting-aware)."""
    depth = 1
    i = start + 1
    while i < len(s):
        if s[i] == "(":  # any paren nests (SQL snippets in $(if ...) etc.)
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced $() in template: {s!r}")


_COLUMNS_CTX: list = []  # compile-time column-set context (for $(format-json --scope ...))


def compile_template(
    template: str, columns: set[str] | None = None
) -> Column:
    """Compile a template string into one string-typed Column."""
    _COLUMNS_CTX.append(columns)
    try:
        return _compile_template_inner(template, columns)
    finally:
        _COLUMNS_CTX.pop()


# type_hint_parse's full hint set (lib/logmsg/tests/test_type_hints.c:64)
_HINT_RE = re.compile(
    r"^(string|literal|json|boolean|bool|int|int32|int64|float|double"
    r"|datetime|list|null|bytes|protobuf)\((.*)\)$",
    re.S,
)


def _type_cast_boolean(c: Column) -> Column:
    """type_cast_to_boolean (lib/logmsg/type-hinting.c:69): decide by
    the FIRST character — T/t/1 → true, F/f/0 → false, else cast error
    (NULL here; 'totaly true' is true, 'fatally false' is false)."""
    first = F.substring(c, 1, 1)
    return F.when(first.isin("T", "t", "1"), F.lit(True)).when(
        first.isin("F", "f", "0"), F.lit(False)
    )


def _type_cast_int(c: Column) -> Column:
    """type_cast_to_int64 (type-hinting.c:125): 0x-prefixed parses hex,
    everything else strict base-10 (leading zeros are DECIMAL: '0111'
    → 111); trailing garbage or empty → cast error (NULL)."""
    stripped = F.regexp_replace(c, r"^[+-]", "")
    neg = c.startswith("-")
    hex_mag = F.regexp_extract(stripped, r"^0[xX]([0-9a-fA-F]+)$", 1)
    dec_ok = stripped.rlike(r"^[0-9]+$")
    mag = F.when(hex_mag != "", F.conv(hex_mag, 16, 10).cast("long")).when(
        dec_ok, stripped.cast("long")
    )
    return F.when(neg, -mag).otherwise(mag)


def _apply_type_hint(hint: str, col: Column) -> Column:
    if hint in ("bool", "boolean"):
        return _type_cast_boolean(col)
    if hint in ("int", "int32", "int64"):
        out = _type_cast_int(col)
        return out.cast("int") if hint == "int32" else out
    if hint in ("float", "double"):
        # strtod-lax: non-numeric → NULL (Spark non-ANSI cast)
        return col.cast("double")
    if hint == "datetime":
        # type_cast_to_datetime_unixtime: fractional epoch seconds
        return F.timestamp_seconds(col.cast("double"))
    if hint == "null":
        return F.lit(None)
    # string/literal/json/list/bytes/protobuf stay textual in the NV
    # model; format-json additionally renders json()/literal()/list()
    # hints as raw tokens (see _format_json)
    return col


# lib/template/templates.h on-error flags; the 'silently-' variants
# only suppress the C daemon's stderr message — identical semantics in
# a batch engine (lib/template/tests/test_template_on_error.c table)
_ON_ERROR_MODES = {
    "drop-message", "silently-drop-message",
    "drop-property", "silently-drop-property",
    "fallback-to-string", "silently-fallback-to-string",
}


def parse_on_error(mode: str) -> str:
    """log_template_on_error_parse analogue: validate and strip the
    'silently-' prefix."""
    if mode not in _ON_ERROR_MODES:
        raise ValueError(f"unknown on-error mode {mode!r}")
    return mode.removeprefix("silently-")


def compile_typed_template(
    template: str, columns: set[str] | None = None,
    on_error: str = "drop-property",
) -> Column:
    """syslog-ng 4 typed templates (lib/template/templates.c type-hint
    syntax): ``int(...)``/``float(...)``/``boolean(...)``/... wrap a
    template and type its result with the REFERENCE cast semantics
    (type-hinting.c: hex ints, first-char booleans, error→NULL); a bare
    numeric literal types itself (the light suite's ``set(10)`` → JSON
    ``10``). Everything else compiles as a plain (string) template.
    $(format-json) renders the resulting Spark column type natively —
    the engine's analogue of LM_VT_* value types."""
    mode = parse_on_error(on_error)
    s = template.strip()
    m = _HINT_RE.match(s)
    if m:
        hint, inner = m.groups()
        raw = compile_template(inner, columns)
        typed = _apply_type_hint(hint, raw)
        if mode == "fallback-to-string" and hint not in (
            "string", "literal", "json", "list", "bytes", "protobuf", "null"
        ):
            # cast failure keeps the original string value (per-row
            # type isn't expressible in one Spark column, so the whole
            # column falls back to string when ANY row might need it)
            return F.coalesce(typed.cast("string"), raw)
        return typed
    if re.fullmatch(r"-?\d+", s):
        return F.lit(int(s))
    if re.fullmatch(r"-?(?:\d+\.\d*|\.\d+)", s):
        return F.lit(float(s))
    return compile_template(template, columns)


def _compile_template_inner(
    template: str, columns: set[str] | None = None
) -> Column:
    parts: list[Column] = []
    pos = 0
    while pos < len(template):
        m = _TOKEN.search(template, pos)
        if m is None:
            parts.append(F.lit(template[pos:]))
            break
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        tok = m.group(0)
        if tok == "$$":
            parts.append(F.lit("$"))
            pos = m.end()
        elif tok == "$(":
            end = _find_call_end(template, m.end() - 1)
            inner = template[m.end() : end - 1]
            parts.append(_compile_call(inner, columns))
            pos = end
        elif tok.startswith("${"):
            inner = tok[2:-1]
            if ":-" in inner:
                # ${NAME:-default} — default when unset OR empty
                # (lib/template/compiler.c default-value syntax,
                # test_template.c '${APP.VALUE99:-ures}' → 'ures')
                name, default = inner.split(":-", 1)
                parts.append(
                    F.coalesce(
                        F.nullif(
                            _resolve_name(name, columns).cast("string"), F.lit("")
                        ),
                        F.lit(default),
                    )
                )
            else:
                parts.append(_resolve_name(inner, columns).cast("string"))
            pos = m.end()
        else:
            parts.append(_resolve_name(tok[1:], columns).cast("string"))
            pos = m.end()
    if not parts:
        return F.lit("")
    out = parts[0] if len(parts) == 1 else F.concat_ws("", *parts)
    return out.cast("string")


def _compile_call(body: str, columns: set[str] | None) -> Column:
    """Compile ``func arg1 arg2 ...`` — args are themselves templates."""
    # split respecting quotes; nested $(...) must survive shlex, so protect them
    tokens = _split_args(body)
    if not tokens:
        raise ValueError("empty $() call")
    fname, args = tokens[0], tokens[1:]
    fn = _TEMPLATE_FUNCS.get(fname)
    if fn is None:
        raise KeyError(f"unknown template function $({fname} ...)")
    compiled = [compile_template(a, columns) for a in args]
    return fn(args, compiled)


def _split_args(body: str) -> list[str]:
    """Split on whitespace, honoring double quotes and nested $()."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    in_q: str | None = None
    saw_quote = False  # a quoted token may be EMPTY ('' is a real arg)
    i = 0
    while i < len(body):
        ch = body[i]
        if in_q:
            if ch == in_q:
                in_q = None
            else:
                buf.append(ch)
        elif ch in ('"', "'") and depth == 0:
            in_q = ch
            saw_quote = True
        elif ch == "$" and i + 1 < len(body) and body[i + 1] == "(":
            depth += 1
            buf.append("$(")
            i += 1
        elif ch == "(" and depth > 0:
            # bare parens inside a nested call (e.g. SQL in $(if ...))
            depth += 1
            buf.append(ch)
        elif ch == ")" and depth > 0:
            depth -= 1
            buf.append(ch)
        elif ch.isspace() and depth == 0:
            if buf or saw_quote:
                out.append("".join(buf))
                buf = []
            saw_quote = False
        else:
            buf.append(ch)
        i += 1
    if buf or saw_quote:
        out.append("".join(buf))
    return out


# --- template function registry (basicfuncs analogues) ------------------------
# Each entry: fn(raw_args: list[str], cols: list[Column]) -> Column

def _num(c: Column) -> Column:
    return c.cast("double")


def _intish(c: Column) -> Column:
    """Integer result when inputs are integral, like the reference's
    numeric funcs which operate on int64 (numeric-funcs.c:81-205)."""
    d = c.cast("double")
    return F.when(d == d.cast("long"), d.cast("long").cast("string")).otherwise(
        d.cast("string")
    )


_TEMPLATE_FUNCS: dict[str, object] = {
    # strings (str-funcs.c)
    "echo": lambda raw, cols: F.concat_ws(" ", *cols),
    "length": lambda raw, cols: F.concat_ws(
        " ", *[F.length(c).cast("string") for c in cols]
    ),
    "substr": lambda raw, cols: F.expr("1").cast("string"),  # replaced below
    # multi-arg str funcs join with a space; strip drops empty results
    # (str-funcs.c tf_string_argv — test_basicfuncs.c:192-215)
    "strip": lambda raw, cols: F.concat_ws(
        " ", *[F.nullif(F.trim(c), F.lit("")) for c in cols]
    ),
    "lowercase": lambda raw, cols: F.lower(F.concat_ws(" ", *cols)),
    "uppercase": lambda raw, cols: F.upper(F.concat_ws(" ", *cols)),
    "sanitize": lambda raw, cols: _sanitize(raw, cols),
    "replace-delimiter": lambda raw, cols: F.translate(cols[0], raw[0], raw[1]),
    "padding": lambda raw, cols: _padding(raw, cols),
    "implode": lambda raw, cols: F.concat_ws(raw[0], *cols[1:]),
    "explode": lambda raw, cols: F.array_join(F.split(cols[1], re.escape(raw[0])), ","),
    # conditional (cond-funcs.c)
    "if": lambda raw, cols: F.when(F.expr(raw[0].strip("'")), cols[1]).otherwise(cols[2]),
    "or": lambda raw, cols: F.coalesce(
        *[F.when(F.length(c) > 0, c) for c in cols]
    ),
    # numeric (numeric-funcs.c)
    "+": lambda raw, cols: _arith("+", cols),
    "-": lambda raw, cols: _arith("-", cols),
    "*": lambda raw, cols: _arith("*", cols),
    "/": lambda raw, cols: _arith("/", cols),
    "%": lambda raw, cols: _arith("%", cols),
    # $(round value [prec]): precision outside 0..20 is NaN
    # (numeric-funcs.c tf_round)
    "round": lambda raw, cols: (
        F.lit("NaN")
        if len(raw) > 1 and not (0 <= int(raw[1]) <= 20)
        else _intish(
            F.round(_num(cols[0]), int(raw[1]) if len(raw) > 1 else 0)
        )
    ),
    "ceil": lambda raw, cols: F.ceil(_num(cols[0])).cast("string"),
    "floor": lambda raw, cols: F.floor(_num(cols[0])).cast("string"),
    # list-aggregating numerics over comma-separated list strings.
    # Non-numeric elements are SKIPPED, an all-invalid list renders ''
    # (numeric-funcs.c tf_num_aggregate / test_numeric_aggregate_*).
    "sum": lambda raw, cols: _intish(
        F.aggregate(_numlist(cols[0]), F.lit(0.0), lambda acc, x: acc + x)
    ),
    "min": lambda raw, cols: _intish(F.array_min(_numlist(cols[0]))),
    "max": lambda raw, cols: _intish(F.array_max(_numlist(cols[0]))),
    # average over all-integer elements divides in int64 (truncating),
    # like the reference's long-mode aggregate: avg(1,2) == 1
    "average": lambda raw, cols: F.when(
        ~F.exists(
            F.split(cols[0], ","),
            lambda x: x.cast("double").isNotNull() & ~x.rlike(r"^\s*-?\d+\s*$"),
        ),
        (
            F.aggregate(_numlist(cols[0]), F.lit(0.0), lambda acc, x: acc + x)
            / F.size(_numlist(cols[0]))
        ).cast("long").cast("string"),
    ).otherwise(
        _intish(
            F.aggregate(_numlist(cols[0]), F.lit(0.0), lambda acc, x: acc + x)
            / F.size(_numlist(cols[0]))
        )
    ),
    # str extras (str-funcs.c)
    "indent-multi-line": lambda raw, cols: F.regexp_replace(
        F.concat_ws(" ", *cols), "\n", "\n\t"
    ),
    # $(binary 0x48 101 108 ...) — bytes from numeric args (str-funcs.c
    # tf_binary); args are plan-time literals like the reference's
    "binary": lambda raw, cols: F.lit(
        "".join(chr(int(a, 0)) for a in raw)
    ),
    # value-pairs views (vp-funcs.c): map keys / values of an nv map col
    "names": lambda raw, cols: F.array_join(
        F.array_sort(F.map_keys(F.col(raw[0]))), ","
    ),
    "values": lambda raw, cols: F.array_join(
        F.map_values(F.col(raw[0])), ","
    ),
    # $(template name fallback...) — invoke a named template
    # (tf-template.c): static binding when the name resolves at compile
    # time; dynamic when it contains '$' (per-row lookup across the
    # registered names, remaining args joined by ' ' as the fallback,
    # tf_template_call); unknown static names are a compile error
    # (tf_template_prepare). Names register via register_named_template().
    "template": lambda raw, cols: _tf_template(raw, cols),
    # lists (list-funcs.c over lib/scanner/list-scanner): a syslog-ng
    # list is comma-separated with optional double-quoted elements
    # (commas/escapes inside survive); every arg is itself a list, args
    # concatenate, unquoted empty elements vanish
    "list-search": lambda raw, cols: F.when(
        F.array_position(_list_arr(cols[1:]), raw[0]) > 0,
        (F.array_position(_list_arr(cols[1:]), raw[0]) - 1).cast("string"),
    ).otherwise(""),
    "list-concat": lambda raw, cols: _list_enc(_list_arr(cols)),
    "list-head": lambda raw, cols: F.coalesce(
        F.element_at(_list_arr(cols), 1), F.lit("")
    ),
    "list-tail": lambda raw, cols: _list_enc(
        F.slice(_list_arr(cols), 2, 1_000_000)
    ),
    "list-nth": lambda raw, cols: F.coalesce(
        F.element_at(_list_arr(cols[1:]), int(raw[0]) + 1), F.lit("")
    ),
    "list-count": lambda raw, cols: F.size(_list_arr(cols)).cast("string"),
    # list-append: first arg parses as a list, FURTHER args append as
    # literal elements (quoted on encode if they contain specials)
    "list-append": lambda raw, cols: _list_enc(
        F.concat(
            _list_arr(cols[:1]),
            F.array(*[c.cast("string") for c in cols[1:]]) if len(cols) > 1
            else F.array().cast("array<string>"),
        )
    ),
    "list-slice": lambda raw, cols: _list_slice(raw, cols),
    # ip (ip-funcs.c)
    "ipv4-to-int": lambda raw, cols: __import__(
        "syslog_ng_spark.functions.filters", fromlist=["ip_to_long"]
    ).ip_to_long(cols[0]).cast("string"),
    # fname (fname-funcs.c)
    # dirname of a bare filename is '.' (files.c tf_dirname /
    # test_basicfuncs.c test_fname_funcs)
    "dirname": lambda raw, cols: F.coalesce(
        F.nullif(F.regexp_extract(cols[0], r"^(.*)/[^/]*$", 1), F.lit("")),
        F.when(cols[0].startswith("/"), F.lit("/")).otherwise(F.lit(".")),
    ),
    "basename": lambda raw, cols: F.regexp_extract(cols[0], r"([^/]*)$", 1),
    # codecs (urlencode.c)
    "base64-encode": lambda raw, cols: F.base64(cols[0].cast("binary")),
    "url-encode": lambda raw, cols: F.url_encode(cols[0]),
    "url-decode": lambda raw, cols: F.url_decode(cols[0]),
    # structured
    "format-json": lambda raw, cols: _format_json(raw, cols),
    # $(format-cim) (scl/cim/template.conf): format-json with the fixed
    # Splunk-CIM shape — @timestamp/@message pairs, .cim.* keys shifted
    # 5 chars, remaining leading-dot prefixes rewritten to '_'
    "format-cim": lambda raw, cols: _format_json(
        [
            "--auto-cast",
            "--pair", "@timestamp=${R_ISODATE}",
            "--pair", "@message=${MSG}",
            "--key", ".cim.*", "--shift", "5",
            "--key", "_*",
            "--key", ".*", "--replace-prefix", ".=_",
            "--key", "*.*",
        ] + list(raw),
        cols,
    ),
    "format-welf": lambda raw, cols: _format_welf(raw, cols),
    "graphite-output": lambda raw, cols: _graphite_output(raw, cols),
    "format-date": lambda raw, cols: _format_date(raw, cols),
    # crypto (modules/cryptofuncs/cryptofuncs.c): args CONCATENATE
    # before hashing, --length/-l truncates the hex (clamped to the
    # digest length), no args is a compile error; $(hash) is sha256.
    # md4 is intentionally absent (no JVM digest; cryptofuncs.c guards
    # it behind an OpenSSL version check too).
    "sha1": lambda raw, cols: _hash_fn("sha1", raw, cols),
    "sha256": lambda raw, cols: _hash_fn("sha256", raw, cols),
    "sha512": lambda raw, cols: _hash_fn("sha512", raw, cols),
    "md5": lambda raw, cols: _hash_fn("md5", raw, cols),
    "hash": lambda raw, cols: _hash_fn("sha256", raw, cols),
    "uuid": lambda raw, cols: F.uuid(),
    # misc
    "env": lambda raw, cols: F.lit(__import__("os").environ.get(raw[0], "")),
    "tag": lambda raw, cols: F.array_contains(F.col("tags"), raw[0]).cast("string"),
    "tags-head": lambda raw, cols: F.element_at(F.col("tags"), 1),
    "stardate": lambda raw, cols: F.round(
        F.year(F.col("ts"))
        + F.dayofyear(F.col("ts")) / 365.25,
        2,
    ).cast("string"),
}


def _list_slice(raw, cols):
    spec = raw[0]
    a, _, b = spec.partition(":")
    start = int(a) if a else 0
    arr = F.split(cols[1], ",")
    if b:
        length = int(b) - start
        return F.array_join(F.slice(arr, start + 1, length), ",")
    return F.array_join(F.slice(arr, start + 1, 1_000_000), ",")





# --- syslog-ng list model (lib/scanner/list-scanner/list-scanner.c) ---------
# A list value is comma-separated; an element may be double-quoted, in
# which case commas survive and backslash escapes decode (\t \" \\ ...).
# Unquoted empty elements are skipped by the scanner.

_LIST_ELEM_RE = re.compile(r'"((?:[^"\\]|\\.)*)"|([^,]+)')
_LIST_DEC = {"t": "\t", "n": "\n", "r": "\r", "\\": "\\", '"': '"'}
_LIST_NEEDS_QUOTE = re.compile(r'[,"\\\t\n\r]')


def _list_parse_py(s):
    if not s:
        return []
    out = []
    for m in _LIST_ELEM_RE.finditer(s):
        if m.group(1) is not None:
            out.append(
                re.sub(
                    r"\\(.)",
                    lambda e: _LIST_DEC.get(e.group(1), "\\" + e.group(1)),
                    m.group(1),
                )
            )
        else:
            out.append(m.group(2))
    return out


def _list_encode_py(items):
    parts = []
    for it in items:
        if it is None:
            continue
        if it == "" or _LIST_NEEDS_QUOTE.search(it):
            enc = it.replace("\\", "\\\\").replace('"', '\\"')
            enc = enc.replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
            parts.append('"' + enc + '"')
        else:
            parts.append(it)
    return ",".join(parts)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _list_parse_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: _list_parse_py(v) if v is not None else [])


@F.pandas_udf(T.StringType())
def _list_enc_udf(a: pd.Series) -> pd.Series:
    return a.map(lambda v: _list_encode_py(list(v)) if v is not None else "")


def _list_arr(cols) -> Column:
    """Parse-and-concat every argument as a list (tf_list semantics:
    each arg is a list in itself)."""
    if not cols:
        return F.array().cast("array<string>")
    return F.concat(*[_list_parse_udf(c.cast("string")) for c in cols])


def _list_enc(arr: Column) -> Column:
    return _list_enc_udf(arr)


def _numlist(c: Column) -> Column:
    """Comma list → array<double> of only the VALID numeric elements
    (invalid/empty skipped); an all-invalid list becomes null so the
    aggregate renders '' like the reference."""
    arr = F.filter(
        F.transform(F.split(c, ","), lambda x: x.cast("double")),
        lambda v: v.isNotNull(),
    )
    return F.when(F.size(arr) > 0, arr)



def _format_date(raw, cols):
    """$(format-date [--time-zone TZ] <strptime-fmt> [timestamp]) —
    modules/timestamp/tests/test_format_date.c: the value may be a
    timestamp string OR a unix epoch (with optional fraction); with no
    value argument the message's own stamp ($STAMP → the ts column)
    formats. --time-zone renders in that zone."""
    args = list(raw)
    i = 0
    tz = None
    if args and args[i] in ("--time-zone", "-t"):
        tz = args[i + 1]
        i += 2
    fmt = _strptime_to_java(args[i])
    val_idx = i + 1
    if val_idx < len(cols):
        v = cols[val_idx]
        ts = F.coalesce(
            F.try_to_timestamp(v),
            F.when(
                v.rlike(r"^\d+(\.\d+)?$"),
                F.timestamp_seconds(v.cast("double")),
            ),
        )
    else:
        ts = F.col("ts")
    out = F.date_format(ts, fmt)
    if tz:
        out = F.date_format(F.from_utc_timestamp(ts, tz), fmt)
    return out


def _arith(op: str, cols):
    """$(+ - * / %) — numeric-funcs.c semantics: both-integer operands
    compute in int64 (including truncating division), otherwise double;
    unparsable operands or a zero divisor render 'NaN'. Divergence: the
    reference prints doubles with 20 decimals; Spark's natural rendering
    is used here."""
    a_s, b_s = cols[0], cols[1]
    both_int = a_s.rlike(r"^-?\d+$") & b_s.rlike(r"^-?\d+$")
    al, bl = a_s.cast("long"), b_s.cast("long")
    ad, bd = a_s.cast("double"), b_s.cast("double")
    if op == "+":
        li, d = al + bl, ad + bd
    elif op == "-":
        li, d = al - bl, ad - bd
    elif op == "*":
        li, d = al * bl, ad * bd
    elif op == "/":
        li = F.when(bl != 0, (al / bl).cast("long"))
        d = F.when(bd != 0.0, ad / bd)
    else:  # %
        li = F.when(bl != 0, al % bl)
        d = F.when(bd != 0.0, ad % bd)
    res = F.when(both_int, li.cast("string")).otherwise(_intish(d))
    return F.coalesce(res, F.lit("NaN"))


def _sanitize(raw, cols):
    opts = {"replacement": "_", "invalid": "/", "keep_control": False}
    args = list(raw)
    vals = []
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("-r", "--replacement"):
            opts["replacement"] = args[i + 1]; i += 2
        elif a in ("-i", "--invalid-chars"):
            opts["invalid"] = args[i + 1].strip("'"); i += 2
        elif a in ("-C", "--ctrl-chars-keep"):
            opts["keep_control"] = True; i += 1
        else:
            vals.append(a); i += 1
    cls = "[" + re.escape(opts["invalid"]) + ("]" if opts["keep_control"] else r"\x00-\x1f]")
    # positional args were compiled to columns; options consumed above
    target = cols[len(cols) - len(vals):] if vals else cols
    # each argument is sanitized INDIVIDUALLY, then args join with '/'
    # (tf_sanitize appends a '/' between positional args)
    cleaned = [F.regexp_replace(c, cls, opts["replacement"]) for c in target]
    return F.concat_ws("/", *cleaned) if len(cleaned) > 1 else cleaned[0]


def _padding(raw, cols):
    """$(padding value width [padstring]) — str-funcs.c tf_padding: the
    value is NEVER truncated; the pad pattern repeats and is cut to fit;
    an empty pad string falls back to spaces."""
    width = int(raw[1])
    pad = raw[2] if len(raw) > 2 else " "
    pad = pad.strip("'") or " "
    v = cols[0]
    return F.when(F.length(v) >= width, v).otherwise(F.lpad(v, width, pad))


def _substr_fn(raw, cols):
    """$(substr value start [len]) — 0-based start; a NEGATIVE start
    counts from the end of the string (str-funcs.c tf_substr)."""
    start = int(raw[1])
    length = int(raw[2]) if len(raw) > 2 else (1 << 30)
    pos = start + 1 if start >= 0 else start
    return F.substring(cols[0], pos, length)


_TEMPLATE_FUNCS["substr"] = _substr_fn


_JSON_RAW_TAG = "\x02J"  # prefix marking a pre-rendered JSON token


def _typed_json_value(col: Column) -> Column:
    """Render a column as its native JSON token (number/bool/string/
    array/object), decided by the ACTUAL Spark type at analysis time —
    the engine's analogue of syslog-ng 4's LM_VT_* typed values. The
    token is extracted from to_json(struct(v)) = '{"v":' + token + '}'
    and tagged so the tree serializer inserts it raw; NULL gives '{}'
    → a NULL result, which the renderer omits like any unset value."""
    j = F.to_json(F.struct(col.alias("v")))
    token = j.substr(F.lit(6), F.length(j) - F.lit(6))
    return F.when(j == "{}", F.lit(None)).otherwise(
        F.concat(F.lit(_JSON_RAW_TAG), token)
    )


def _json_pair_value(tmpl: str, cur_cols) -> Column:
    """format-json pair values honor template type hints (format-json.c
    type-cast default in syslog-ng 4): json()/literal() insert the
    rendered text as a RAW JSON token, list() renders the syslog-ng
    list as a JSON string array, numeric/boolean hints emit bare
    tokens. Un-hinted values stay strings (the nv model)."""
    m = _HINT_RE.match(tmpl.strip())
    if not m:
        return compile_template(tmpl, cur_cols).cast("string")
    hint, inner = m.groups()
    if hint in ("json", "literal"):
        return F.concat(F.lit(_JSON_RAW_TAG), compile_template(inner, cur_cols))
    if hint == "list":
        arr = _list_arr([compile_template(inner, cur_cols)])
        return F.concat(F.lit(_JSON_RAW_TAG), F.to_json(arr))
    typed = _apply_type_hint(hint, compile_template(inner, cur_cols))
    if hint in ("string", "bytes", "protobuf"):
        return typed.cast("string")
    return _typed_json_value(typed)


def _format_json(raw, cols):
    """$(format-json ...) — modules/json/format-json.c shape
    (expectations from tests/test_format_json.c):

    - ``key=value`` pairs; DOTTED keys build NESTED objects
      (msg.text=x msg.id=42 → {"msg":{"text":..,"id":..}});
    - a leading '.' maps to '_' unless --leave-initial-dot;
    - --scope s1,s2 merges value-pairs scopes; --key / --exclude glob
      the merged key set; --shift-levels N / --add-prefix P transform
      keys before nesting; bare names select nv entries (omitted when
      unset);
    - --auto-cast / --omit-empty-values are accepted; values here are
      strings (the engine's nv model) and null/absent values are
      omitted, which covers the omit-empty contract for unset names.
    """
    import json as _json  # noqa: PLC0415

    cur_cols = _COLUMNS_CTX[-1] if _COLUMNS_CTX else None
    scopes: list[str] = []
    inc: list[str] = []
    exc: list[str] = []
    leave_dot = False
    pairs: list = []
    bare: list[str] = []
    # value-pairs semantics: a transform (--shift/--shift-levels/
    # --replace-prefix/--add-prefix) binds to the key-set of the MOST
    # RECENT --key glob; with no --key yet it applies to every selected
    # key (vp_cmdline_parse_rekey — transforms attach to the last key)
    _GLOBAL = {"glob": None, "shift_levels": 0, "shift": 0,
               "add_prefix": "", "replace": []}
    key_specs: list[dict] = []

    def _tf_target():
        return key_specs[-1] if key_specs else _GLOBAL

    i = 0
    while i < len(raw):
        a = raw[i]
        if a == "--scope":
            scopes += [x.strip() for x in raw[i + 1].split(",")]
            i += 2
        elif a == "--key":
            inc.append(raw[i + 1])
            key_specs.append({"glob": raw[i + 1], "shift_levels": 0,
                              "shift": 0, "add_prefix": "", "replace": []})
            i += 2
        elif a == "--exclude":
            exc.append(raw[i + 1]); i += 2
        elif a == "--leave-initial-dot":
            leave_dot = True; i += 1
        elif a == "--shift-levels":
            _tf_target()["shift_levels"] = int(raw[i + 1]); i += 2
        elif a == "--shift":
            # strips N CHARACTERS from the key front (vs shift-levels'
            # dotted segments)
            _tf_target()["shift"] = int(raw[i + 1]); i += 2
        elif a == "--add-prefix":
            _tf_target()["add_prefix"] = raw[i + 1]; i += 2
        elif a == "--replace-prefix":
            _tf_target()["replace"].append(tuple(raw[i + 1].split("=", 1)))
            i += 2
        elif a == "--pair":
            # --pair k=v — same as a bare k=v argument (value-pairs.c)
            k, v = raw[i + 1].split("=", 1)
            pairs.append((k, _json_pair_value(v, cur_cols)))
            i += 2
        elif a in ("--auto-cast", "--omit-empty-values"):
            i += 1
        elif "=" in a:
            k, v = a.split("=", 1)
            pairs.append((k, _json_pair_value(v, cur_cols)))
            i += 1
        else:
            bare.append(a); i += 1

    m = F.create_map().cast("map<string,string>")
    if scopes:
        from .value_pairs import _scope_map  # noqa: PLC0415

        for sc in scopes:
            m = F.map_concat(m, _scope_map(sorted(cur_cols or []), sc))
    # --key/--exclude globs select from the SCOPE-sourced keys only;
    # explicit pairs and bare selections are direct vp_pairs and bypass
    # the glob filter (value-pairs.c) — filter before concatenating them
    if inc or exc:
        from .value_pairs import _glob_pred  # noqa: PLC0415

        if inc:
            preds = [_glob_pred(pg) for pg in inc]
            m = F.map_filter(m, lambda k, _v: _fold_or([p(k) for p in preds]))
        if exc:
            preds = [_glob_pred(pg) for pg in exc]
            m = F.map_filter(m, lambda k, _v: ~_fold_or([p(k) for p in preds]))
    entries = []
    for name in bare:
        if any(g in name for g in "*?["):
            # a bare glob is a value-pairs key selector
            # (vp_cmdline_parse_pair: non-option args without '='
            # select keys): expand against the compile-time column set
            # (typed) and filter the nv map (strings) at runtime
            import fnmatch as _fn  # noqa: PLC0415

            for col_name in sorted(cur_cols or []):
                if col_name != NV_COL and _fn.fnmatchcase(col_name, name):
                    entries += [F.lit(col_name), _typed_json_value(F.col(col_name))]
            if cur_cols is None or NV_COL in cur_cols:
                from .value_pairs import _glob_pred  # noqa: PLC0415

                pred = _glob_pred(name)
                m = F.map_concat(
                    m, F.map_filter(F.col(NV_COL), lambda k, _v: pred(k))
                )
            continue
        # bare value-pairs names resolve like ${...}: engine columns
        # (host/program/...) and macros too, not only nv-map entries
        # (value-pairs.c selects builtin values by name as well)
        if (
            cur_cols is not None
            and name not in cur_cols
            and NV_COL not in cur_cols
            and not is_macro(name)
        ):
            val = F.lit(None).cast("string")  # no nv map to fall back to
        elif cur_cols is not None and name in cur_cols:
            # a real engine column: render its Spark type natively
            # (syslog-ng 4 typed values — int/double/bool emit bare
            # JSON tokens, format-json.c type-cast default)
            val = _typed_json_value(F.col(name))
        else:
            val = _resolve_name(name, cur_cols).cast("string")
        entries += [F.lit(name), val]
    for name, col in pairs:
        entries += [F.lit(name), col.cast("string")]
    if entries:
        m = F.map_concat(m, F.create_map(*entries))

    def render(d):
        if d is None:
            return "{}"
        import fnmatch as _fn  # noqa: PLC0415

        tree: dict = {}
        for k, v in d.items():
            if v is None:
                continue
            # ALL transform sets apply sequentially, each re-testing its
            # glob against the (possibly already rewritten) key —
            # vp_transform_apply loops every set and
            # value_pairs_transform_set_apply re-matches per set; with no
            # --key spec the global set applies unconditionally
            for spec in key_specs or [_GLOBAL]:
                if spec["glob"] is not None and not _fn.fnmatchcase(k, spec["glob"]):
                    continue
                if spec["shift_levels"]:
                    segs0 = k.split(".")
                    k = ".".join(segs0[min(spec["shift_levels"], len(segs0) - 1):])
                if spec["shift"]:
                    # g_string_erase semantics: clamp, empty result allowed
                    k = k[spec["shift"]:]
                for old, new in spec["replace"]:
                    if k.startswith(old):
                        k = new + k[len(old):]
                        break
                k = spec["add_prefix"] + k
            if k.startswith(".") and not leave_dot:
                k = "_" + k[1:]
            segs = [sg for sg in k.split(".") if sg != ""] or [k]
            # a leading-dot key keeps its first empty segment as part of
            # the first rendered segment when leave_dot is on
            if k.startswith(".") and leave_dot:
                segs = ["." + segs[0]] + segs[1:]
            node = tree
            for sg in segs[:-1]:
                nxt = node.get(sg)
                if not isinstance(nxt, dict):
                    nxt = {}
                    node[sg] = nxt
                node = nxt
            node[segs[-1]] = v

        def dump(node):
            if isinstance(node, dict):
                return "{" + ",".join(
                    _json.dumps(k, ensure_ascii=False) + ":" + dump(v)
                    for k, v in node.items()
                ) + "}"
            if isinstance(node, str) and node.startswith(_JSON_RAW_TAG):
                return node[len(_JSON_RAW_TAG):]  # pre-rendered token
            return _json.dumps(node, ensure_ascii=False)

        return dump(tree)

    @F.pandas_udf(T.StringType())
    def _render_udf(col: pd.Series) -> pd.Series:
        return col.map(render)

    return _render_udf(m)


def _fold_or(conds):
    c = conds[0]
    for x in conds[1:]:
        c = c | x
    return c


def _lambda_template(template: str):
    """Element-template compiler for $(map)/$(filter): `$_` binds to the
    list element (tf-map.c / tf-filter.c analogues)."""

    def body(x: Column) -> Column:
        _BINDINGS.append({"_": x})
        try:
            return compile_template(template)
        finally:
            _BINDINGS.pop()

    return body


def _fn_map(raw, cols):
    return F.array_join(
        F.transform(F.split(cols[1], ","), _lambda_template(raw[0])), ","
    )


def _fn_filter(raw, cols):
    """$(filter COND list) — COND is a template over ``$_``; truthy =
    'true' or any non-zero number (the reference evaluates a filter
    expression; template-truthiness is the documented divergence)."""
    body = _lambda_template(raw[0])

    def truthy(x):
        v = body(x)
        return (F.lower(v) == "true") | (
            F.coalesce(v.cast("double") != 0, F.lit(False))
        )

    return F.array_join(F.filter(F.split(cols[1], ","), truthy), ",")


_TEMPLATE_FUNCS["map"] = _fn_map
_TEMPLATE_FUNCS["filter"] = _fn_filter


_ITER_AFFINE = re.compile(r"^\$\(([+*])\s+(?:\$_\s+(-?\d+(?:\.\d+)?)|(-?\d+(?:\.\d+)?)\s+\$_)\s*\)$")


def _fn_iterate(raw, cols):
    """$(iterate UPDATE INITIAL [ORDER_COL]) — stateful per-message
    generator (tf-iterate.c): emits the current value, then current =
    UPDATE evaluated with ``$_`` = current.

    The reference's generator is a mutex'd scalar advanced in message
    order; a batch engine expresses the recurrence over an explicit row
    order (the extra ORDER_COL argument — a documented divergence;
    default ``turn_idx``). Affine updates ``$(+ $_ c)`` / ``$(* $_ c)``
    have closed forms over row_number, so they run as ONE window, no
    sequential scan. Non-affine updates need the sequential
    ``operators.grouping.iterate_rows`` instead.
    """
    from pyspark.sql import Window as W  # noqa: PLC0415

    update, init = raw[0], raw[1]
    order = raw[2] if len(raw) > 2 else "turn_idx"
    m = _ITER_AFFINE.match(update.strip())
    if not m:
        raise NotImplementedError(
            "$(iterate) supports affine updates $(+ $_ c) / $(* $_ c) as a "
            "window closed form; for arbitrary recurrences use "
            "syslog_ng_spark.operators.grouping.iterate_rows"
        )
    op, c1, c2 = m.groups()
    c = float(c1 if c1 is not None else c2)
    init_v = float(init)
    rn = F.row_number().over(W.orderBy(F.col(order))) - 1
    val = (F.lit(init_v) + F.lit(c) * rn) if op == "+" else (
        F.lit(init_v) * F.pow(F.lit(c), rn)
    )
    # integer inputs render like the reference's integer generator
    if init_v == int(init_v) and c == int(c):
        return val.cast("long").cast("string")
    return val.cast("string")


_TEMPLATE_FUNCS["iterate"] = _fn_iterate


def _cef_escape(c: Column) -> Column:
    """CEF extension value escaping (modules/cef/format-cef-extension.c
    test expectations): backslash doubles, '=' escapes, newline/CR →
    \\n/\\r, TAB → \\u0009, NUL → \\x00; '|' is NOT escaped in the
    extension part. (The \\xNN invalid-UTF-8 byte case cannot arise
    here: parquet/Spark strings are valid UTF-8 by construction.)"""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "=", r"\\=")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\u0009")
    c = F.regexp_replace(c, "\x00", r"\\x00")
    return c


# a CEF extension KEY must be printable ASCII without = | \ or spaces
_CEF_BAD_KEY_RX = r"[=|\\\n\r\t ]|[^\x20-\x7e]"


def _format_cef_extension(raw, cols):
    """$(format-cef-extension [--subkeys PREFIX] [--on-error MODE]
    k=v ...) — modules/cef/format-cef-extension.c: --subkeys selects
    nv keys by prefix (stripped, key-sorted); invalid keys drop the
    whole result (on-error drop-message, the reference default) or
    just the property (drop-property)."""
    subkeys = None
    on_error = "drop-message"
    pairs = []
    i = 0
    while i < len(raw):
        a = raw[i]
        if a == "--subkeys":
            if i + 1 >= len(raw):
                raise ValueError("Missing argument for --subkeys")
            if raw[i + 1] == "":
                raise ValueError(
                    "Error parsing value-pairs: --subkeys requires a "
                    "non-empty argument"
                )
            subkeys = raw[i + 1]
            i += 2
        elif a == "--on-error":
            on_error = raw[i + 1]
            i += 2
        elif "=" in a:
            pairs.append(a.split("=", 1))
            i += 1
        else:
            i += 1
    parts = []
    for k, v in pairs:
        # inline pairs are value-pairs too: --subkeys strips their
        # prefix as well (test_inline: '.cef.k=v' renders 'k=v')
        if subkeys is not None and k.startswith(subkeys):
            k = k[len(subkeys):]
        if re.search(_CEF_BAD_KEY_RX, k):
            raise ValueError(f"invalid CEF extension key {k!r}")
        parts.append(F.concat(F.lit(k + "="), _cef_escape(compile_template(v))))
    invalid_any = F.lit(False)
    cur_cols = _COLUMNS_CTX[-1] if _COLUMNS_CTX else None
    if subkeys is not None and (cur_cols is None or NV_COL in cur_cols):
        sel = F.map_filter(
            F.col(NV_COL), lambda k, _v: k.startswith(subkeys)
        )
        ent = F.array_sort(F.map_entries(sel))
        strip = len(subkeys)

        def skey(e):
            return F.substring(e["key"], strip + 1, 1 << 30)

        invalid_any = F.exists(ent, lambda e: skey(e).rlike(_CEF_BAD_KEY_RX))
        good = F.filter(ent, lambda e: ~skey(e).rlike(_CEF_BAD_KEY_RX))
        rendered = F.array_join(
            F.transform(
                good,
                lambda e: F.concat(skey(e), F.lit("="), _cef_escape(e["value"])),
            ),
            " ",
        )
        parts.append(F.nullif(rendered, F.lit("")))
    out = F.concat_ws(" ", *parts) if parts else F.lit("")
    if on_error == "drop-property":
        return out
    return F.when(invalid_any, F.lit("")).otherwise(out)


_TEMPLATE_FUNCS["format-cef-extension"] = _format_cef_extension


def _hash_fn(algo: str, raw, cols) -> Column:
    """modules/cryptofuncs/cryptofuncs.c tf_hash: concatenated-args
    digest with optional --length/-l hex truncation."""
    length = None
    data_cols = []
    i = 0
    while i < len(raw):
        if raw[i] in ("--length", "-l"):
            if i + 1 >= len(raw) or not re.fullmatch(r"\d+", raw[i + 1]):
                raise ValueError(
                    "$(hash) parsing failed, invalid length specification"
                )
            length = int(raw[i + 1])
            i += 2
            continue
        data_cols.append(cols[i])
        i += 1
    if not data_cols:
        raise ValueError("$(hash) parsing failed, invalid number of arguments")
    data = F.concat_ws("", *data_cols).cast("binary")
    h = {
        "sha1": lambda: F.sha1(data),
        "md5": lambda: F.md5(data),
        "sha256": lambda: F.sha2(data, 256),
        "sha512": lambda: F.sha2(data, 512),
    }[algo]()
    # substring clamps past-the-end lengths, matching the reference
    return F.substring(h, 1, length) if length else h


def _welf_value(v: Column) -> Column:
    """WELF value rendering (format-welf.c tf_format_welf_foreach):
    bare unless it contains a space — then double-quoted with \\ and "
    escaped (AUTF8_UNSAFE_QUOTE)."""
    quoted = F.concat(
        F.lit('"'),
        F.regexp_replace(
            F.regexp_replace(v, r"\\", r"\\\\"), '"', r'\\"'
        ),
        F.lit('"'),
    )
    return F.when(v.contains(" "), quoted).otherwise(v)


def _format_welf(raw, cols):
    """$(format-welf ...) — modules/kvformat/format-welf.c: a full
    value-pairs command line (--scope / --key globs / --exclude globs
    — comma lists and repeats —, explicit k=v pairs, bare selector
    globs/names), merged into one key set and rendered SORTED with the
    'id' key first (tf_format_welf_strcmp); space-containing values are
    quoted."""
    m = _vp_cmdline_map(raw)
    m = F.map_filter(m, lambda _k, v: v.isNotNull())
    # sorted iteration with 'id' first (tf_format_welf_strcmp)
    ent = F.array_sort(
        F.transform(
            F.map_entries(m),
            lambda e: F.struct(
                (e["key"] != "id").alias("notid"),
                e["key"].alias("key"),
                e["value"].alias("value"),
            ),
        )
    )
    return F.array_join(
        F.transform(
            ent, lambda e: F.concat(e["key"], F.lit("="), _welf_value(e["value"]))
        ),
        " ",
    )


def _vp_cmdline_map(raw) -> Column:
    """value_pairs_new_from_cmdline analogue: --scope / --key /
    --exclude (comma lists + repeats), explicit k=v pairs, bare
    selector globs — merged into one map<string,string> of the
    selected (key, rendered value) pairs."""
    import fnmatch as _fn  # noqa: PLC0415

    cur_cols = _COLUMNS_CTX[-1] if _COLUMNS_CTX else None
    scopes: list[str] = []
    inc: list[str] = []
    exc: list[str] = []
    entries: list = []
    i = 0
    while i < len(raw):
        a = raw[i]
        if a == "--scope":
            scopes += [x.strip() for x in raw[i + 1].split(",")]
            i += 2
        elif a == "--key":
            inc += raw[i + 1].split(",")
            i += 2
        elif a == "--exclude":
            exc += raw[i + 1].split(",")
            i += 2
        elif "=" in a:
            k, v = a.split("=", 1)
            entries += [F.lit(k), compile_template(v, cur_cols)]
            i += 1
        else:
            inc.append(a)
            i += 1

    m = F.create_map().cast("map<string,string>")
    if scopes:
        from .value_pairs import _scope_map  # noqa: PLC0415

        for sc in scopes:
            m = F.map_concat(m, _scope_map(sorted(cur_cols or []), sc))
    if inc:
        from .value_pairs import _glob_pred  # noqa: PLC0415

        # selection globs pull from engine columns and the nv map
        for col_name in sorted(cur_cols or []):
            if col_name != NV_COL and any(
                _fn.fnmatchcase(col_name, g) for g in inc
            ):
                entries += [F.lit(col_name), F.col(col_name).cast("string")]
        if cur_cols is None or NV_COL in cur_cols:
            preds = [_glob_pred(g) for g in inc]
            m = F.map_concat(
                m,
                F.map_filter(
                    F.col(NV_COL), lambda k, _v: _fold_or([p(k) for p in preds])
                ),
            )
    if entries:
        m = F.map_concat(m, F.create_map(*entries))
    if exc:
        from .value_pairs import _glob_pred  # noqa: PLC0415

        preds = [_glob_pred(g) for g in exc]
        m = F.map_filter(m, lambda k, _v: ~_fold_or([p(k) for p in preds]))
    return m


def _graphite_output(raw, cols):
    """$(graphite-output [--timestamp T] <value-pairs cmdline>) —
    modules/graphite/graphite-output.c: one Graphite plaintext line
    'name value timestamp\\n' per selected pair (EVERY line
    newline-terminated, tf_graphite_foreach_func), keys sorted, a
    leading '.' always rewritten to '_' (the hardwired
    replace-prefix transform, tf_graphite_prepare), timestamp
    defaulting to $R_UNIXTIME."""
    cur_cols = _COLUMNS_CTX[-1] if _COLUMNS_CTX else None
    ts = None
    rest: list[str] = []
    i = 0
    while i < len(raw):
        if raw[i] in ("--timestamp", "-t"):
            ts = compile_template(raw[i + 1], cur_cols)
            i += 2
        else:
            rest.append(raw[i])
            i += 1
    if ts is None:
        ts = compile_template("${R_UNIXTIME}", cur_cols)

    m = _vp_cmdline_map(rest)
    m = F.map_filter(m, lambda _k, v: v.isNotNull())
    ent = F.array_sort(
        F.transform(
            F.map_entries(m),
            lambda e: F.struct(
                F.regexp_replace(e["key"], r"^\.", "_").alias("key"),
                e["value"].alias("value"),
            ),
        )
    )
    return F.array_join(
        F.transform(
            ent,
            lambda e: F.concat(
                e["key"], F.lit(" "), e["value"], F.lit(" "), ts, F.lit("\n")
            ),
        ),
        "",
    )


def _strptime_to_java(fmt: str) -> str:
    """Subset strptime → java.time pattern translation. Literal LETTERS
    outside %-directives must be single-quoted for java.time ('T' in
    %Y-%m-%dT%H:%M:%S would otherwise be read as a pattern char)."""
    table = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%b": "MMM", "%e": "d", "%z": "xx", "%f": "SSSSSS",
        "%j": "DDD", "%y": "yy", "%p": "a", "%I": "hh", "%A": "EEEE", "%a": "EEE",
        "%%": "%",
    }
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt) and "%" + fmt[i + 1] in table:
            out.append(table["%" + fmt[i + 1]])
            i += 2
        elif fmt[i].isalpha():
            j = i
            while j < len(fmt) and fmt[j].isalpha():
                j += 1
            out.append("'" + fmt[i:j] + "'")
            i = j
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


_NAMED_TEMPLATES: dict = {}


def register_named_template(name: str, template: str, columns=None) -> None:
    """template { t_name("..."); } analogue: $(template t_name) expands
    to the named template's compiled Column (tf-template.c)."""
    _NAMED_TEMPLATES[name] = (template, columns)


def _template_renderable(template: str, columns) -> bool:
    """Can ``template`` resolve against the ``columns`` context? Plain
    $name references must be macros, match slots, nv-reachable, or
    present columns — otherwise compiling it into a dynamic-dispatch
    CASE would fail ANALYSIS for every row, even ones that never pick
    this template."""
    if columns is None:
        return True
    for m in _TOKEN.finditer(template):
        tok = m.group(0)
        if tok in ("$$", "$("):
            continue
        name = tok[2:-1] if tok.startswith("${") else tok[1:]
        name = name.split(":-", 1)[0]
        if name.isdigit() or is_macro(name) or name in columns:
            continue
        if NV_COL in columns:  # unknown names fall back to the nv map
            continue
        return False
    return True


def _tf_template(raw, cols):
    name = raw[0]
    cur_cols = _COLUMNS_CTX[-1] if _COLUMNS_CTX else None
    if name in _NAMED_TEMPLATES:  # static binding
        tmpl, reg_cols = _NAMED_TEMPLATES[name]
        # the INVOKING frame's columns win: the template renders against
        # the message it's applied to, not the registration-time schema
        return compile_template(tmpl, cur_cols if cur_cols is not None else reg_cols)
    if "$" not in name:
        raise KeyError(
            f'$(template) Unknown template function or template "{name}"'
        )
    # dynamic binding: the name is itself a template, resolved per row
    # against the (config-time-fixed) registry; unmatched rows render
    # the fallback args joined by ' '. Registered templates that cannot
    # resolve in THIS frame are treated as lookup misses (the reference
    # renders unset nv values as ''; a missing Spark column has no
    # analogous empty — it simply cannot bind here).
    fallback = F.concat_ws(" ", *cols[1:]) if len(cols) > 1 else F.lit("")
    expr = fallback
    for known, (tmpl, reg_cols) in _NAMED_TEMPLATES.items():
        ctx = cur_cols if cur_cols is not None else reg_cols
        if not _template_renderable(tmpl, ctx):
            continue
        expr = F.when(cols[0] == F.lit(known), compile_template(tmpl, ctx)).otherwise(expr)
    return expr


def register_template_func(name: str, fn) -> None:
    """User-function hook (lib/template/user-function.c analogue)."""
    _TEMPLATE_FUNCS[name] = fn


def _getent_fn(raw, cols):
    """$(getent entity key [member]) — modules/getent/tfgetent.c: NSS
    passwd/group/services/protocols lookups; the key argument may itself
    be a template. Tables come from enrich.register_getent_table /
    load_getent_from_os (per-row libc calls don't exist on executors)."""
    if not 2 <= len(raw) <= 3:
        raise ValueError("$(getent) needs: entity key [member]")
    from ..operators.enrich import getent  # noqa: PLC0415

    # cols[1] is the already-compiled key template (the _compile_call
    # contract: fn(raw_args, compiled_args))
    return getent(raw[0], cols[1], raw[2] if len(raw) == 3 else None)


_TEMPLATE_FUNCS["getent"] = _getent_fn


def template_func_names() -> list[str]:
    return sorted(_TEMPLATE_FUNCS)


def _format_gelf(raw, cols):
    """$(format-gelf) (scl/graylog2/plugin.conf): GELF 1.1 payload —
    format-json with the fixed field set, numeric level/timestamp
    (--auto-cast int()/int64() in the reference), empty values omitted
    by to_json's null-dropping. The trailing $(binary 0x00) GELF TCP
    framing byte is transport-level and intentionally not part of the
    rendered column (sinks here are tables, not sockets)."""
    def t(name):
        return compile_template("${" + name + "}")

    def nullif_empty(c):
        return F.when(c != "", c)

    return F.to_json(
        F.struct(
            F.lit("1.1").alias("version"),
            F.coalesce(nullif_empty(t("HOST")), F.lit("-")).alias("host"),
            F.coalesce(nullif_empty(t("MSG")), F.lit("-")).alias("short_message"),
            nullif_empty(t("LEVEL_NUM")).cast("int").alias("level"),
            nullif_empty(t("R_UNIXTIME")).cast("bigint").alias("timestamp"),
            nullif_empty(t("PROGRAM")).alias("_program"),
            nullif_empty(t("PID")).cast("int").alias("_pid"),
            nullif_empty(t("FACILITY")).alias("_facility"),
        )
    )


_TEMPLATE_FUNCS["format-gelf"] = _format_gelf


def loggly_line(token: str, tag: str, template: str = "${MSG}") -> Column:
    """scl/loggly/loggly.conf network-destination line: RFC5424 header +
    the customer-token SDATA element + the payload template."""
    return compile_template(
        "<${PRI}>1 ${ISODATE} ${HOST} ${PROGRAM} ${PID} ${MSGID} "
        f'[{token}@41058 tag="{tag}"] {template}'
    )


def collectd_putval_line(
    plugin: str,
    type_name: str,
    plugin_instance: str = "",
    type_instance: str = "",
    interval: str | int = 60,
    values: str = "U",
    host_template: str = "${HOST}",
) -> Column:
    """scl/collectd/plugin.conf destination template: the PUTVAL line the
    unix-stream socket would carry — 'PUTVAL host/plugin[-inst]/type
    [-inst] [interval=N] <unixtime>:values'. The reference's $(if ...)
    branches test config literals, so they collapse at build time here;
    every argument may itself be a template string (backtick substitution
    in the reference block)."""
    ident = plugin + (f"-{plugin_instance}" if plugin_instance else "")
    tid = type_name + (f"-{type_instance}" if type_instance else "")
    opt = f" interval={interval}" if interval != "" else ""
    return compile_template(
        f"PUTVAL {host_template}/{ident}/{tid}{opt} ${{UNIXTIME}}:{values}"
    )


def splunk_hec_raw_line(template: str = "${S_ISODATE} ${HOST} ${MSGHDR}${MSG}") -> Column:
    """scl/splunk/splunk.conf splunk_hec_raw() body template (the HTTP
    batching/token plumbing collapses to a table write per SURVEY's
    threaded-destination mapping)."""
    return compile_template(template)
