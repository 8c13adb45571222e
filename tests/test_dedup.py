"""Dedup operator tests: exact, MinHash-LSH (vs exact Jaccard oracle),
SimHash, n-gram pairs — on planted near-duplicates."""

import pytest

from syslog_ng_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # 1-word change → high jaccard
FAR = (
    "completely different content about spark dataframes shuffles and "
    "catalyst optimizer rules with no overlap to speak of at all here"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, NEAR),
        (3, FAR),
        (4, BASE),          # exact duplicate of 1
        (5, "  THE QUICK brown fox jumps over the lazy dog while the cat watches from the warm windowsill and the birds sing in the garden outside "),  # normalized dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = D.exact_dedup(docs)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 2, 3]  # 4 and 5 collapse onto 1


def test_minhash_lsh_finds_planted_pair(docs):
    pairs = {(r.id_a, r.id_b) for r in D.minhash_lsh(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs or (1, 4) in pairs
    assert (1, 4) in pairs  # exact dup always survives
    assert not any(3 in p for p in pairs)  # FAR is not a near-dup


def test_minhash_vs_exact_jaccard_oracle(docs):
    lsh = {(r.id_a, r.id_b): r.jaccard for r in D.minhash_lsh(docs, threshold=0.5).collect()}
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # verified jaccard values are computed on true shingles → identical where both report
    for pair, j in lsh.items():
        assert pair in exact
        assert abs(exact[pair] - j) < 1e-9


def test_minhash_dedup_drops_losers(docs):
    kept = sorted(r.doc_id for r in D.minhash_dedup(docs, threshold=0.5).collect())
    assert 1 in kept and 3 in kept
    assert 4 not in kept


def test_simhash_near_pairs(docs):
    pairs = {(r.id_a, r.id_b) for r in D.simhash_pairs(docs, max_hamming=8).collect()}
    assert (1, 4) in pairs  # identical docs at hamming 0
    assert (1, 2) in pairs  # near dup within 8 bits
    assert not any(3 in p for p in pairs)


def test_simhash_deterministic(spark, docs):
    from pyspark.sql import functions as F

    a = docs.select(D.simhash(F.col("text")).alias("h")).collect()
    b = docs.select(D.simhash(F.col("text")).alias("h")).collect()
    assert [r.h for r in a] == [r.h for r in b]


def test_minhash_bucket_cap_defuses_hot_bucket(spark):
    """A boilerplate cluster (2000 identical docs) would otherwise create
    a 2000-doc LSH bucket -> 2M candidate pairs per band. With the cap,
    those buckets drop (accounted), while distinct near-dup pairs outside
    the hot cluster are still found."""
    hot = [(i, "identical boilerplate text repeated everywhere forever and ever again") for i in range(2000)]
    cold = [(10_001, BASE), (10_002, NEAR), (10_003, FAR)]
    df = spark.createDataFrame(hot + cold, "doc_id long, text string")
    out = D.minhash_lsh(df, threshold=0.5, max_bucket_size=100, eager=True)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (10_001, 10_002) in pairs           # cold near-dup found
    assert not any(a < 2000 and b < 2000 for a, b in pairs)  # hot bucket dropped
    # without the cap the same corpus yields the quadratic candidate set
    uncapped = D.minhash_lsh(
        df.filter("doc_id >= 1990"), threshold=0.5, max_bucket_size=None
    )
    n = uncapped.count()
    assert n == 10 * 9 / 2 + 1  # C(10,2) hot pairs + the cold pair


def test_simhash_near_dup_matches_exact_jaccard(docs):
    got = {(r.id_a, r.id_b) for r in D.simhash_near_dup(docs, threshold=0.5).collect()}
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == exact


def test_simhash_pairs_chunk_width_param(docs):
    # 8 chunks of 8 bits: recall guaranteed to hamming <= 7
    out = D.simhash_pairs(docs, max_hamming=7, n_chunks=8)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 4) in pairs  # identical fingerprints, hamming 0
