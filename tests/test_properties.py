"""Property-based tests (hypothesis) for the plan-time compilers —
pure-Python components, no Spark session needed, so examples are cheap."""

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_ng_spark.functions.templates import _find_call_end, _split_args
from syslog_ng_spark.operators.patterndb import compile_pattern

_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=8
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_ident, min_size=1, max_size=6))
def test_split_args_plain_tokens(tokens):
    assert _split_args(" ".join(tokens)) == tokens


@settings(max_examples=200, deadline=None)
@given(_ident, st.text(alphabet="abc =,$", min_size=0, max_size=20))
def test_split_args_quoted_preserves_content(name, content):
    # a double-quoted arg survives verbatim (quotes stripped)
    out = _split_args(f'{name} "{content}"')
    assert out[0] == name
    if content:
        assert out[1] == content


@settings(max_examples=200, deadline=None)
@given(st.lists(_ident, min_size=1, max_size=4))
def test_find_call_end_nested(tokens):
    # build nested calls: $(f1 $(f2 ... ))
    inner = tokens[-1]
    for t in reversed(tokens[:-1]):
        inner = f"$({t} {inner})"
    template = inner + " tail"
    if template.startswith("$("):
        end = _find_call_end(template, 1)
        assert template[end - 1] == ")"
        assert template[end:] == " tail"


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.sampled_from(["lit ", "@NUMBER:n@", "@ESTRING:e: @", "@IPv4:ip@", "x=", "@QSTRING:q:\"@"]),
        min_size=1,
        max_size=5,
    )
)
def test_compile_pattern_always_valid_regex(parts):
    """Any wildcard composition compiles to a valid, anchored regex with
    one named group per named wildcard."""
    # de-duplicate group names by suffixing position
    pat = ""
    for i, p in enumerate(parts):
        pat += p.replace(":n@", f":n{i}@").replace(":e:", f":e{i}:").replace(
            ":ip@", f":ip{i}@"
        ).replace(":q:", f":q{i}:")
    rx = compile_pattern(pat)
    creg = re.compile(rx)  # must not raise
    assert rx.startswith("^")
    n_named = len([p for p in parts if ":" in p and p.startswith("@")])
    assert len(creg.groupindex) == n_named


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdef*?.x-", min_size=0, max_size=12), st.text(alphabet="abcdef.x-", min_size=0, max_size=12))
def test_glob_translation_matches_fnmatch(pattern, value):
    """The glob→LIKE translation agrees with Python fnmatch for the
    supported subset (* and ? only, no character classes)."""
    from syslog_ng_spark.functions.filters import _glob_to_like

    like = _glob_to_like(pattern)
    # reimplement LIKE in Python to compare semantics
    rx = "^" + re.escape(like).replace("%", ".*").replace("_", ".") + "$"
    # undo escaping artifacts: re.escape escapes nothing in %/_ anyway
    got = re.match(rx, value) is not None
    want = fnmatch.fnmatchcase(value, pattern)
    assert got == want


# --- round-2 parser properties (pure regex compilers, no Spark) -------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(_ident, st.text(alphabet="abcdefxyz0123.,:", min_size=0, max_size=10)),
        min_size=1,
        max_size=5,
    ),
    st.sampled_from([";", "|", "&", ", "]),
)
def test_kv_regex_roundtrip_any_pair_separator(pairs, sep):
    """The kv regex built for a pair separator recovers exactly the pairs
    joined with it, for values free of quotes/whitespace/sep chars."""
    import re as _re

    stop = set(sep) | set(" \t")
    pairs = [(k, "".join(ch for ch in v if ch not in stop)) for k, v in pairs]
    line = sep.join(f"{k}={v}" for k, v in pairs)
    vs = _re.escape("=")
    stop_cls = _re.escape("".join(sorted(set(sep))))
    pat = _re.compile(
        rf'([A-Za-z0-9._\-]+){vs}'
        rf'("(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'|[^\s{stop_cls}]*)'
    )
    got = {}
    for k, v in pat.findall(line):
        got[k] = v
    assert got == dict(pairs)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(alphabet="abc x,", min_size=0, max_size=8), min_size=1, max_size=4),
    st.text(alphabet="abc x,", min_size=0, max_size=12),
)
def test_csv_greedy_tail_regex_dialect_aware(head_fields, tail):
    """The greedy-tail regex consumes n-1 quoted-or-bare fields and
    captures the remainder verbatim — a quoted head field containing the
    delimiter must not shift the split."""
    import re as _re

    def render(f):
        return f'"{f.replace(chr(34), chr(34)*2)}"' if ("," in f or not f) else f

    line = ",".join(render(f) for f in head_fields) + "," + tail
    q, d = _re.escape('"'), _re.escape(",")
    fld = f"(?:{q}(?:[^{q}]|{q}{q})*{q}|[^{d}]*)"
    pat = f"^(?:{fld}{d}){{{len(head_fields)}}}(.*)$"
    m = _re.match(pat, line, flags=_re.DOTALL)
    assert m is not None
    assert m.group(1) == tail
