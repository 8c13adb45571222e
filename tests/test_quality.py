"""Unigram-LM quality scoring (operators/quality.py)."""

import math

import pytest

from syslog_ng_spark.operators.quality import unigram_logprob, unigram_stats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "zyzzyva qwerty"),  # rare garbage => lowest score
        (4, "the the the"),
        (5, "   "),  # no tokens => absent from output
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def py_scores(rows, vocab_limit=None):
    toks = {}
    counts = {}
    for doc_id, text in rows:
        ts = [t for t in (text or "").split(" ") if t]
        if ts:
            toks[doc_id] = ts
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    if vocab_limit is not None:
        keep = sorted(counts, key=lambda t: (-counts[t], t))[:vocab_limit]
        counts = {t: counts[t] for t in keep}
    out = {}
    for doc_id, ts in toks.items():
        lp = [math.log(counts.get(t, 1) / total) for t in ts]
        out[doc_id] = (len(ts), sum(lp) / len(lp))
    return out


def test_unigram_stats_counts(spark, corpus):
    got = {r._tok: r.c for r in unigram_stats(corpus).collect()}
    assert got["the"] == 6
    assert got["sat"] == 2
    assert got["zyzzyva"] == 1
    assert "" not in got


def test_unigram_logprob_exact(spark, corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    expect = py_scores(rows)
    got = {r.doc_id: (r.n_tokens, r.logprob) for r in unigram_logprob(corpus).collect()}
    assert set(got) == set(expect)  # docs 5/6 absent
    for doc_id, (n, lp) in expect.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(lp, abs=1e-6)
    # ranking: the all-common-token doc tops, the garbage doc bottoms
    assert got[4][1] == max(lp for _, lp in got.values())
    assert got[3][1] == min(lp for _, lp in got.values())


def test_unigram_logprob_broadcast_vocab_oov_floor(spark, corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    expect = py_scores(rows, vocab_limit=3)
    got = {
        r.doc_id: (r.n_tokens, r.logprob)
        for r in unigram_logprob(corpus, vocab_limit=3).collect()
    }
    assert set(got) == set(expect)
    for doc_id, (n, lp) in expect.items():
        assert got[doc_id] == (n, pytest.approx(lp, abs=1e-6))


def test_unigram_logprob_external_vocab(spark, corpus):
    vocab = unigram_stats(corpus.filter("doc_id <= 2"))
    got = {
        r.doc_id: r.logprob
        for r in unigram_logprob(
            corpus.filter("doc_id IN (1, 2)"), vocab=vocab
        ).collect()
    }
    rows = [(1, "the cat sat on the mat"), (2, "the dog sat")]
    expect = py_scores(rows)
    for doc_id, (_, lp) in expect.items():
        assert got[doc_id] == pytest.approx(lp, abs=1e-6)
