"""Benchmark decontamination (operators/decontaminate.py): n-gram
overlap flagging vs a hand-computed Python oracle, plus the exact
(unhashed) mode and plan-shape checks (benchmark side broadcast)."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.decontaminate import (
    decontaminate,
    decontaminate_filter,
)


def _py_ngrams(text, n):
    tk = [t for t in text.lower().split() if t]
    return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox sat still"),  # shares 'the quick brown fox'? 4-gram? with n=3 shares 'the quick brown'
    (4, "completely unrelated content nothing shared here at all"),
    (5, "short"),  # fewer than n tokens -> zero grams
    (6, ""),  # empty
]
BENCH = [
    (100, "the quick brown fox jumps high"),
    (101, "five dozen liquor jugs on a shelf"),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    return docs, bench


def _oracle(n, min_overlap=1):
    bench_grams = set()
    for _, t in BENCH:
        bench_grams |= _py_ngrams(t, n)
    out = {}
    for did, t in DOCS:
        grams = _py_ngrams(t, n)
        ov = len(grams & bench_grams)
        out[did] = (len(grams), ov, ov >= min_overlap)
    return out


@pytest.mark.parametrize("n", [2, 3, 4])
@pytest.mark.parametrize("hash_grams", [True, False])
def test_matches_python_oracle(frames, n, hash_grams):
    docs, bench = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
        for r in decontaminate(
            docs, bench, n=n, hash_grams=hash_grams
        ).collect()
    }
    assert got == _oracle(n)


def test_min_overlap_threshold(frames):
    docs, bench = frames
    want = _oracle(3, min_overlap=2)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
        for r in decontaminate(docs, bench, n=3, min_overlap=2).collect()
    }
    assert got == want


def test_filter_drops_exactly_the_contaminated(frames):
    docs, bench = frames
    oracle = _oracle(3)
    clean = decontaminate_filter(docs, bench, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == sorted(
        did for did, (_, _, bad) in oracle.items() if not bad
    )
    # schema unchanged: the filter returns original columns only
    assert clean.columns == docs.columns


def test_self_decontamination_flags_everything_with_grams(frames):
    docs, _ = frames
    out = decontaminate(docs, docs, n=2)
    for r in out.collect():
        assert r["contaminated"] == (r["n_grams"] > 0)
        assert r["n_overlap"] == r["n_grams"]


def test_benchmark_side_is_broadcast(frames):
    docs, bench = frames
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
