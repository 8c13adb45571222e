"""Seeded fuzz tests: engine parsers vs pure-Python oracles on randomized
inputs (fixed seed — deterministic)."""

import random
import re
import string

from syslog_ng_spark.operators.parsers import kv_parser, syslog_parser

_KV_PAT = re.compile(
    r'([A-Za-z0-9._\-]+)=("(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'|[^\s,]*)'
)


def _kv_oracle(t):
    out = {}
    for k, v in _KV_PAT.findall(t):
        if v[:1] in ('"', "'") and v[-1:] == v[:1] and len(v) >= 2:
            v = v[1:-1]
        out[k] = v
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
