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


def test_hybrid_rerank_matches_python_oracle(spark, frames):
    """BM25 candidates reranked by cosine against a query vector."""
    from syslog_ng_spark.operators.bm25 import hybrid_topk

    docs, qs = frames
    # embeddings chosen so the cosine order inverts the BM25 order for
    # query 100 ("spark fast"): doc 5 is lexically best but doc 3's
    # vector aligns with the query vector
    EMB = {1: [1.0, 0.0], 2: [0.0, 1.0], 3: [0.9, 0.1],
           4: [0.5, 0.5], 5: [0.1, 0.9], 6: [1.0, 1.0]}
    emb = spark.createDataFrame(
        [(d, v) for d, v in EMB.items()], "vec_id long, embedding array<double>"
    )
    qvecs = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "query_id long, qvec array<double>",
    )
    got = {}
    for r in hybrid_topk(docs, qs, emb, qvecs, k=3, k_lex=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["cos"])
        )
    for qid in got:
        got[qid].sort()

    want = {}
    cands = _oracle(k=10)
    for qid, rows in cands.items():
        qv = {100: [1.0, 0.0], 101: [0.0, 1.0]}.get(qid)
        if qv is None or not rows:
            continue
        rr = []
        for d, bm, _ in rows:
            v = EMB[d]
            dot = sum(a * b for a, b in zip(v, qv))
            import math as m
            cos = dot / (m.sqrt(sum(a * a for a in v)) * m.sqrt(sum(a * a for a in qv)))
            rr.append((round(cos, 6), -d))
        rr.sort(reverse=True)
        want[qid] = [(i + 1, -md, c) for i, (c, md) in enumerate(rr[:3])]
    assert got == want
