"""BM25 retrieval (operators/bm25.py) vs a hand-computed Python oracle
(Lucene-variant idf, k1=1.2 b=0.75), plus plan shape (query terms
broadcast; corpus side never sort-merge-joins)."""

import math

import pytest

from syslog_ng_spark.operators.bm25 import bm25_topk

DOCS = [
    (1, "spark runs fast and spark scales"),
    (2, "the cat sat on the mat"),
    (3, "spark streaming joins fast tables"),
    (4, "a totally unrelated document about cooking"),
    (5, "fast fast fast"),
    (6, ""),
]
QUERIES = [(100, "spark fast"), (101, "cat cooking"), (102, "zzz-absent")]

K1, B = 1.2, 0.75


def _tok(t):
    return [x for x in t.lower().split(" ") if x]


def _oracle(k=10):
    n = len(DOCS)
    dls = {d: len(_tok(t)) for d, t in DOCS}
    avgdl = sum(dls.values()) / n
    out = {}
    for qid, qt in QUERIES:
        terms = set(_tok(qt))
        scores = {}
        for d, t in DOCS:
            toks = _tok(t)
            s = 0.0
            for term in terms:
                tf = toks.count(term)
                if not tf:
                    continue
                df = sum(1 for _, t2 in DOCS if term in _tok(t2))
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                s += idf * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * dls[d] / avgdl)
                )
            if s > 0:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [
            (d, s, i + 1) for i, (d, s) in enumerate(ranked)
        ]
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    return docs, qs


def test_matches_python_oracle(frames):
    docs, qs = frames
    got = {}
    for r in bm25_topk(docs, qs).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"])
        )
    for qid in got:
        got[qid].sort(key=lambda x: x[2])
    want = {q: rows for q, rows in _oracle().items() if rows}
    assert got == want


def test_k_truncates(frames):
    docs, qs = frames
    got = bm25_topk(docs, qs, k=1).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        assert len(rows) == 1 and rows[0]["rank"] == 1
        assert rows[0]["doc_id"] == _oracle(k=1)[qid][0][0]


def test_no_match_queries_absent(frames):
    docs, qs = frames
    qids = {r["query_id"] for r in bm25_topk(docs, qs).collect()}
    assert 102 not in qids


def test_plan_broadcasts_terms_no_smj_before_topk(frames):
    docs, qs = frames
    plan = (
        bm25_topk(docs, qs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
