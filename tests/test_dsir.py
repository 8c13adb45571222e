"""DSIR importance resampling (operators/dsir.py) vs a hand-computed
Python oracle mirroring every stage: hashed n-gram features (md5-prefix
buckets), Laplace-smoothed log ratios, per-doc log weights, and the
deterministic Gumbel top-k selection."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.dsir import (
    dsir_fit,
    dsir_logweights,
    dsir_resample,
)

B = 512


def _bucket(g, salt=""):
    return int(hashlib.md5((salt + g).encode()).hexdigest()[:8], 16) % B


def _feats(text, n_max=2):
    tk = [t for t in text.split(" ") if t]
    out = [_bucket(t) for t in tk]
    for n in range(2, n_max + 1):
        out += [
            _bucket(" ".join(tk[i : i + n])) for i in range(len(tk) - n + 1)
        ]
    return out


TGT = [
    (0, "solar panel efficiency measured in lab tests"),
    (1, "solar cell efficiency improves with new panel design"),
    (2, "lab measured solar output data"),
]
RAW = [
    (10, "solar panel output measured in field"),
    (11, "new panel design tested in lab"),
    (12, "win money now casino bonus spins"),
    (13, "cheap pills casino bonus click now"),
    (14, ""),  # no features -> absent from weights
]


def _oracle_ratios():
    tc, rc = {}, {}
    for _, t in TGT:
        for b in _feats(t):
            tc[b] = tc.get(b, 0) + 1
    for _, t in RAW:
        for b in _feats(t):
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for b in set(tc) | set(rc):
        out[b] = math.log((tc.get(b, 0) + 1) / float(tt + B)) - math.log(
            (rc.get(b, 0) + 1) / float(rt + B)
        )
    return out


def _oracle_weights():
    ratios = _oracle_ratios()
    out = {}
    for did, t in RAW:
        fs = _feats(t)
        if fs:
            out[did] = (len(fs), round(sum(ratios.get(b, 0.0) for b in fs), 6))
    return out


def _gumbel(did, seed="dsir"):
    h = int(
        hashlib.md5((seed + str(did)).encode()).hexdigest()[:8], 16
    ) % (1 << 20)
    u = (h + 0.5) / float(1 << 20)
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    tgt = spark.createDataFrame(TGT, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    return tgt, raw


def test_fit_matches_python_oracle(frames):
    tgt, raw = frames
    got = {
        r["_b"]: r["log_ratio"]
        for r in dsir_fit(tgt, raw, buckets=B).collect()
    }
    want = _oracle_ratios()
    assert set(got) == set(want)
    for b in want:
        assert got[b] == pytest.approx(want[b], abs=1e-12), b


def test_logweights_match_python_oracle(frames):
    tgt, raw = frames
    ratios = dsir_fit(tgt, raw, buckets=B)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_logweights(raw, ratios, buckets=B).collect()
    }
    assert got == _oracle_weights()


def test_target_like_docs_outrank_spam(frames):
    tgt, raw = frames
    ratios = dsir_fit(tgt, raw, buckets=B)
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(raw, ratios, buckets=B).collect()
    }
    assert min(w[10], w[11]) > max(w[12], w[13])


def test_resample_is_gumbel_topk_and_deterministic(frames):
    tgt, raw = frames
    ratios = dsir_fit(tgt, raw, buckets=B)
    sel = dsir_resample(raw, ratios, k=2, buckets=B)
    ids = sorted(r["doc_id"] for r in sel.collect())
    weights = _oracle_weights()
    keyed = sorted(
        ((round(w + _gumbel(d), 6), -d) for d, (_, w) in weights.items()),
        reverse=True,
    )
    want = sorted(-x[1] for x in keyed[:2])
    assert ids == want
    # re-run: byte-identical selection
    again = sorted(r["doc_id"] for r in dsir_resample(raw, ratios, k=2, buckets=B).collect())
    assert again == ids


def test_threshold_mode(frames):
    tgt, raw = frames
    ratios = dsir_fit(tgt, raw, buckets=B)
    weights = _oracle_weights()
    keys = {d: round(w + _gumbel(d), 6) for d, (_, w) in weights.items()}
    cut = sorted(keys.values())[len(keys) // 2]
    sel = dsir_resample(raw, ratios, threshold=cut, buckets=B)
    ids = sorted(r["doc_id"] for r in sel.collect())
    assert ids == sorted(d for d, v in keys.items() if v > cut)


def test_k_and_threshold_are_exclusive(frames):
    tgt, raw = frames
    ratios = dsir_fit(tgt, raw, buckets=B)
    with pytest.raises(ValueError):
        dsir_resample(raw, ratios, buckets=B)
    with pytest.raises(ValueError):
        dsir_resample(raw, ratios, k=1, threshold=0.0, buckets=B)
