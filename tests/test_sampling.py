"""Deterministic mixing / shuffle-shard operators (operators/sampling.py).

The invariant under test everywhere: every decision is a pure function
of (salt, id) via the md5-prefix bucket, so an independent plain-Python
recomputation must reproduce the Spark output row-for-row.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.sampling import (
    mix_sources,
    portable_bucket,
    shuffle_shards,
    stratified_sample_exact,
)


def py_bucket(value, denom=10_000, salt=""):
    h = hashlib.md5((salt + str(value)).encode()).hexdigest()
    return int(h[:8], 16) % denom


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", f"text {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string").cache()


def test_portable_bucket_matches_python(spark):
    got = (
        spark.range(50)
        .select("id", portable_bucket(F.col("id")).alias("b"))
        .collect()
    )
    for r in got:
        assert r.b == py_bucket(r.id)


def test_mix_drop_keep_oversample(docs):
    out = mix_sources(
        docs, {"src0": 0.0, "src1": 1.0, "src2": 2.0, "src3": 2.5}
    )
    rows = out.select("doc_id", "source", "copy_idx").collect()
    assert not any(r.source == "src0" for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r.doc_id, r.source), []).append(r.copy_idx)
    for (doc_id, source), copies in by_doc.items():
        if source == "src1":
            expect = 1
        elif source == "src2":
            expect = 2
        else:
            expect = 2 + (1 if py_bucket(doc_id) < 5000 else 0)
        assert sorted(copies) == list(range(expect)), (doc_id, source)
    # every src1/src2 doc survives with the full copy count
    assert sum(1 for (_, s) in by_doc if s == "src1") == 100
    assert sum(1 for (_, s) in by_doc if s == "src2") == 100


def test_mix_fractional_downsample_rate_and_determinism(docs):
    out = mix_sources(docs, {}, default_weight=0.35)
    kept = sorted(r.doc_id for r in out.select("doc_id").collect())
    expect = sorted(i for i in range(400) if py_bucket(i) < 3500)
    assert kept == expect  # exact selection, not just the rate
    again = sorted(
        r.doc_id
        for r in mix_sources(docs, {}, default_weight=0.35).select("doc_id").collect()
    )
    assert again == kept


def test_mix_rejects_negative_weight(docs):
    with pytest.raises(ValueError):
        mix_sources(docs, {"src0": -1.0})
    with pytest.raises(ValueError):
        mix_sources(docs, {}, default_weight=-0.5)


def test_shuffle_shards_matches_python_permutation(docs):
    out = shuffle_shards(docs, n_shards=8, salt="ep1:")
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == 400

    def key(i):
        return hashlib.md5(f"ep1:{i}".encode()).hexdigest()

    expect = {}
    shards = {}
    for i in range(400):
        shards.setdefault(int(key(i)[:8], 16) % 8, []).append(i)
    for shard, ids in shards.items():
        for pos, i in enumerate(sorted(ids, key=lambda x: (key(x), x)), start=1):
            expect[i] = (shard, pos)
    got = {r.doc_id: (r.shard, r.pos) for r in rows}
    assert got == expect


def test_shuffle_shards_salt_changes_permutation(docs):
    a = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_shards(docs, 8, salt="a:").collect()
    }
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_shards(docs, 8, salt="b:").collect()
    }
    assert a != b
    # both are complete permutations: per-shard positions are 1..n
    for perm in (a, b):
        per_shard = {}
        for shard, pos in perm.values():
            per_shard.setdefault(shard, []).append(pos)
        for positions in per_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shuffle_shards_rejects_bad_n(docs):
    with pytest.raises(ValueError):
        shuffle_shards(docs, 0)


# ---- stratified_sample_exact ------------------------------------------------


def _md5_rank_sample(rows, k_of, id_ix=0, g_ix=1):
    """Python oracle: per-stratum k smallest md5(str(id))."""
    import collections
    import hashlib

    by = collections.defaultdict(list)
    for r in rows:
        by[r[g_ix]].append((hashlib.md5(str(r[id_ix]).encode()).hexdigest(), r[id_ix]))
    out = {}
    for g, lst in by.items():
        for rank, (_, i) in enumerate(sorted(lst), start=1):
            if rank <= k_of(g):
                out[i] = (g, rank)
    return out


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, "abc"[i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, ["doc_id", "g"])


def test_stratified_exact_matches_python_oracle(strata_df):
    exp = _md5_rank_sample(strata_df.collect(), lambda g: 10)
    for pf in (False, True):
        got = {
            r["doc_id"]: (r["g"], r["rank"])
            for r in stratified_sample_exact(
                strata_df, 10, strata_col="g", prefilter=pf, rank_col="rank"
            ).collect()
        }
        assert got == exp, f"prefilter={pf}"


def test_stratified_dict_k_and_default(strata_df):
    out = stratified_sample_exact(
        strata_df, {"a": 5, "b": 2}, strata_col="g", default_k=1
    )
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts == {"a": 5, "b": 2, "c": 1}
    # default_k=None drops unlisted strata
    out2 = stratified_sample_exact(strata_df, {"a": 3}, strata_col="g")
    assert {r["g"] for r in out2.select("g").distinct().collect()} == {"a"}


def test_stratified_small_stratum_keeps_all(spark):
    rows = [(i, "big") for i in range(100)] + [(900 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    out = stratified_sample_exact(df, 10, strata_col="g", prefilter=True)
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts == {"big": 10, "tiny": 3}


def test_stratified_underfill_fallback_is_exact(strata_df):
    # factor barely above 1 forces underfilled strata through the
    # audit fallback; the result must STILL be the exact top-k set
    exp = _md5_rank_sample(strata_df.collect(), lambda g: 50)
    got = {
        r["doc_id"]: (r["g"], r["rank"])
        for r in stratified_sample_exact(
            strata_df,
            50,
            strata_col="g",
            prefilter=True,
            prefilter_factor=1.01,
            rank_col="rank",
        ).collect()
    }
    assert got == exp


def test_stratified_salt_changes_sample(strata_df):
    a = {r["doc_id"] for r in stratified_sample_exact(strata_df, 10, strata_col="g").collect()}
    b = {r["doc_id"] for r in stratified_sample_exact(strata_df, 10, strata_col="g", salt="ep2").collect()}
    assert a != b and len(a) == len(b) == 30


def test_stratified_validation(strata_df):
    with pytest.raises(ValueError):
        stratified_sample_exact(strata_df, -1, strata_col="g")
    with pytest.raises(ValueError):
        stratified_sample_exact(strata_df, {"a": -2}, strata_col="g")
    with pytest.raises(ValueError):
        stratified_sample_exact(strata_df, 5, strata_col="g", prefilter_factor=0.5)
    with pytest.raises(ValueError):
        stratified_sample_exact(strata_df, {}, strata_col="g")


def test_stratified_null_stratum_parity(spark):
    """ADVICE r6 (high): NULL-stratum rows must be sampled identically
    by the prefilter and window paths — the broadcast-counts equi-join
    silently dropped them (they landed in neither the safe nor the
    unsafe branch)."""
    rows = [(i, "a" if i % 2 == 0 else None) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    exp = _md5_rank_sample(df.collect(), lambda g: 5)
    for pf in (False, True):
        got = {
            r["doc_id"]: (r["g"], r["rank"])
            for r in stratified_sample_exact(
                df, 5, strata_col="g", prefilter=pf, rank_col="rank"
            ).collect()
        }
        assert got == exp, f"prefilter={pf}"
    # both strata present, exactly k each
    out = stratified_sample_exact(df, 5, strata_col="g", prefilter=True)
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts == {"a": 5, None: 5}
