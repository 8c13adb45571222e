"""Seeded fuzz tests: engine parsers vs pure-Python oracles on randomized
inputs (fixed seed — deterministic)."""

import random
import re
import string

from syslog_ng_spark.operators.parsers import kv_parser, syslog_parser

_KEYSEP_RE = re.compile(r"([A-Za-z0-9_\-]+)[ ]*=")
_NEXTKEY_RE = re.compile(r"[ ]+[A-Za-z0-9_\-]+[ ]*=")
_ESC = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
        "\\": "\\", '"': '"', "'": "'"}


def _kv_oracle(t):
    """Independent character-walking reimplementation of kv-scanner.c's
    default-config semantics (NOT the engine's regex): quoted values
    C-string-unescape, unquoted values run to the exact ', ' separator /
    the next key= token / end-of-line with trailing spaces trimmed."""
    out = {}
    i, n = 0, len(t)
    while i < n:
        m = _KEYSEP_RE.search(t, i)
        if not m:
            break
        k, j = m.group(1), m.end()
        # leading spaces are skipped only when the remainder is a real
        # value (not EOS / next key= / pair separator) — kv-scanner.c
        # _skip_initial_spaces via _match_delimiter
        j2 = j
        while j2 < n and t[j2] == " ":
            j2 += 1
        if j2 > j and not (
            j2 >= n
            or _KEYSEP_RE.match(t, j2)
            or t.startswith(", ", j2)
        ):
            j = j2
        if j < n and t[j] in "\"'":
            q, j2, buf, esc, closed = t[j], j + 1, [], False, False
            while j2 < n:
                c = t[j2]
                if esc:
                    buf.append(_ESC.get(c, "\\" + c))
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == q:
                    closed = True
                    j2 += 1
                    break
                else:
                    buf.append(c)
                j2 += 1
            if closed:
                out[k] = "".join(buf)
                i = j2
                continue
        end = j
        while end < n:
            if t.startswith(", ", end):
                break
            if _NEXTKEY_RE.match(t, end):
                break
            end += 1
        out[k] = t[j:end].rstrip(" ")
        i = end if end > m.end() else m.end()
    return out


def _random_kv_line(rng):
    parts = []
    for _ in range(rng.randint(0, 6)):
        k = "".join(rng.choices(string.ascii_lowercase + "._-", k=rng.randint(1, 8)))
        style = rng.random()
        if style < 0.3:
            v = '"' + " ".join(rng.choices(["a b", "x=y", "z,w", ""], k=2)) + '"'
        elif style < 0.4:
            v = ""
        else:
            v = "".join(rng.choices(string.ascii_letters + string.digits + "./:", k=rng.randint(0, 10)))
        parts.append(f"{k}={v}")
        if rng.random() < 0.3:
            parts.append(rng.choice(["stray", "words,", "<junk>"]))
    return " ".join(parts)


def test_kv_parser_fuzz_vs_oracle(spark):
    rng = random.Random(1234)
    lines = [_random_kv_line(rng) for _ in range(300)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(lines)], "i int, text string")
    rows = kv_parser(df).orderBy("i").collect()
    for row, line in zip(rows, lines):
        assert row.kv == _kv_oracle(line), f"line={line!r}"


def test_syslog_parser_fuzz_never_throws(spark):
    """Adversarial text (regex metachars, long lines, unicode, empties)
    must parse or cleanly not-match — never raise."""
    rng = random.Random(99)
    alphabet = string.printable + "日本語Ωß"
    lines = [
        "".join(rng.choices(alphabet, k=rng.randint(0, 300))) for _ in range(200)
    ] + ["", "<999>x", "<0>", "<34>Oct 11 22:14:15 h app: ok", "a" * 5000]
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(i, t, ts) for i, t in enumerate(lines)], "i int, text string, ts timestamp"
    )
    out = syslog_parser(df).select("i", "syslog_matched", "pri").collect()
    assert len(out) == len(lines)
    ok = [r for r in out if r.i == len(lines) - 2]
    assert ok[0].syslog_matched and ok[0].pri == 34
