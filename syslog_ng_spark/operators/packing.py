"""Sequence packing for LLM training batches: assign documents to
fixed-token-budget packs.

Two semantics, both deterministic given a total order over documents:

- ``pack_chunked`` — GPT-style concat-then-chunk: documents are laid
  end-to-end in order and the token stream is cut every ``budget``
  tokens; a document can span chunks (``pack_first``..``pack_last``).
  This is the high-throughput pre-training layout.
- ``pack_greedy`` — exact sequential first-fit: a document never
  splits; when it doesn't fit in the open pack, the pack closes. This
  is the instruction-tuning layout (loss masking needs whole docs).

Scale shape: ``pack_chunked`` needs a GLOBAL running sum — a naive
``Window.orderBy(...)`` collapses to one partition. Instead it uses the
classic two-phase scan: range-repartition by the order column,
per-partition window cumsum, then a per-partition-totals prefix table
(numPartitions rows — tiny) broadcast back. Cost: one range shuffle +
one broadcast join; no single-partition stage anywhere.

``pack_greedy`` is inherently a serial scan (each decision depends on
the previous pack's fill); it runs per ``shard_col`` group through
applyInPandas — the same documented serial-per-key exact pattern as the
token bucket in operators/suppress.py. Shard by date/source for
parallelism; pack ids are (shard, local) pairs.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _global_cumsum(
    df: DataFrame, size_col: str, order_col: str, out_col: str
) -> DataFrame:
    """Exclusive global running sum of ``size_col`` in ``order_col``
    order, with exactly ONE corpus shuffle.

    The bucket id is a DETERMINISTIC function of the row (uniform
    buckets over [min, max] of the numeric order column), NOT
    ``spark_partition_id()`` over a ``repartitionByRange``: the range
    partitioner SAMPLES its boundaries, so when the cumsum branch and
    the per-bucket-totals branch re-evaluate the exchange separately
    (AQE exchange reuse is an optimization, not a guarantee — a 10M-doc
    composite pipeline was measured producing offsets 0.3% off when
    reuse did not fire) they can disagree about which row belongs to
    which partition. With the bucket computed from the data, the totals
    branch aggregates straight off the SOURCE (map-side partial: at
    most tasks × n_buckets tiny rows shuffle) and consistency holds
    regardless of exchange reuse, AQE decisions, or recomputation.

    A ``Window.partitionBy(bucket)`` local cumsum would force a SECOND
    full hash exchange; instead the per-bucket running sum runs as a
    narrow Arrow pass over the bucket-partitioned, (bucket, order)-
    sorted partitions, resetting at bucket changes (a partition may
    host several whole buckets). ``size_col`` must be non-null;
    ``order_col`` must be numeric (unique per the packing contract).

    Skew note: uniform buckets over the id span are balanced for
    dense-ish ids (the packing contract's doc_id). Pathological id
    clustering maps to few buckets — repartition ids first if so."""
    if not isinstance(
        df.schema[order_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        raise ValueError(
            f"pack_chunked order_col {order_col!r} must be numeric"
        )
    lo, hi = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if lo is None:  # empty frame
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = float(hi) - float(lo) + 1.0
    # bucket count derived from the id SPAN (guide §2: scale-adaptive
    # partitioning, not a constant): ~4k ids per bucket up to the
    # 4×parallelism ceiling. Small corpora get a handful of buckets
    # instead of 128 near-empty Arrow tasks; wide (hash-id / billion-row)
    # spans hit the ceiling, which is the old behavior. nb only affects
    # internal grouping — the cumsum is exact for any nb.
    nb = int(max(1, min(
        df.sparkSession.sparkContext.defaultParallelism * 4,
        span // 4096 + 1,
    )))
    # Compute the bucket in DOUBLE: '(col - lo) * nb' in long arithmetic
    # silently wraps for wide id spans (hash-derived 64-bit ids), which
    # would collapse most rows into bucket 0 — still deterministic (the
    # bucket stays a pure row function) but one giant partition. Double
    # precision loses low bits on 64-bit spans, which only blurs bucket
    # BOUNDARIES, never determinism.
    bucket = F.least(
        F.lit(nb - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(order_col).cast("double") - F.lit(float(lo)))
                * nb
                / F.lit(span)
            ),
        ),
    ).cast("int")

    part = (
        df.withColumn("_pid", bucket)
        .repartition(nb, "_pid")
        .sortWithinPartitions("_pid", order_col)
    )
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("_pid", T.IntegerType()),
            T.StructField("_local_cum", T.LongType()),
        ]
    )

    def cum(batches):
        import numpy as np  # noqa: PLC0415

        run = 0
        prev_pid = None
        for pdf in batches:
            sizes = pdf[size_col].to_numpy(dtype="int64")
            pids = pdf["_pid"].to_numpy()
            out = pdf.copy()
            cums = np.empty(len(pdf), dtype="int64")
            i = 0
            while i < len(pdf):
                j = i
                while j < len(pdf) and pids[j] == pids[i]:
                    j += 1
                if pids[i] != prev_pid:
                    run = 0
                    prev_pid = pids[i]
                seg = sizes[i:j]
                cums[i:j] = np.cumsum(seg) - seg + run
                run += int(seg.sum())
                i = j
            out["_local_cum"] = cums
            yield out

    local = part.mapInPandas(cum, schema=schema)
    totals = (
        df.groupBy(bucket.alias("_pid"))
        .agg(F.sum(size_col).alias("_tot"))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_prefix")
    )
    return (
        local.join(F.broadcast(totals), "_pid")
        .withColumn(out_col, F.col("_local_cum") + F.col("_prefix"))
        .drop("_pid", "_local_cum")
    )


def pack_chunked(
    df: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk assignment. Adds ``start_off`` (global token
    offset), ``pack_first``/``pack_last`` (chunk ids this document's
    tokens land in) and ``n_spans``. ``order_col`` must be unique."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = _global_cumsum(df, size_col, order_col, "start_off")
    end_off = F.col("start_off") + F.greatest(F.col(size_col), F.lit(1)) - 1
    return (
        out.withColumn(
            "pack_first", F.floor(F.col("start_off") / budget)
        )
        .withColumn("pack_last", F.floor(end_off / budget))
        .withColumn("n_spans", F.col("pack_last") - F.col("pack_first") + 1)
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    order_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Exact first-fit packing: adds ``pack_id`` (string ``shard/idx``).
    Documents larger than ``budget`` get a pack of their own. Serial
    per shard; pass ``shard_col`` to parallelize across shards."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = shard_col or "_one"
    src = df if shard_col else df.withColumn("_one", F.lit("all"))
    # copy — StructType.add mutates, and src.schema is src's LIVE schema
    schema = T.StructType(
        list(src.schema.fields) + [T.StructField("pack_id", T.StringType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        key = str(pdf[shard].iloc[0])
        ids, fill, idx = [], 0, 0
        for size in pdf[size_col]:
            size = int(size)
            if fill > 0 and fill + size > budget:
                idx += 1
                fill = 0
            fill += size
            ids.append(f"{key}/{idx}")
            if size >= budget:  # oversized doc closes its own pack
                idx += 1
                fill = 0
        pdf["pack_id"] = ids
        return pdf

    out = src.groupBy(shard).applyInPandas(pack, schema=schema)
    return out.drop("_one") if not shard_col else out


def pack_stats(packed: DataFrame, size_col: str = "n_tokens") -> DataFrame:
    """Per-pack occupancy summary for ``pack_greedy`` output."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).alias("n_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding token-window chunking: split each document into
    ``chunk_tokens``-token windows every ``stride`` tokens (overlap =
    chunk_tokens − stride; stride defaults to chunk_tokens = disjoint).
    The RAG/context-window layout — where packing lays whole documents
    into budgets, chunking cuts one document into (possibly
    overlapping) model-sized pieces.

    Emits one row per chunk: (id, chunk_idx, tok_start, n_tokens,
    chunk_text). Tokens are whitespace-split (the textstats convention);
    a window opens at every multiple of ``stride`` strictly below the
    document's token count, so the last chunk may be short and a
    document shorter than ``chunk_tokens`` yields exactly one chunk.

    Scale shape: pure per-row Column work + one explode — ZERO
    shuffles, no UDF; the token array is materialized once per row and
    sliced per window (explode_outer sidesteps the
    InferFiltersFromGenerate re-inlining trap, see
    operators/decontaminate.py).
    """
    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    out = (
        df.withColumn("_toks", toks)
        # clamp: size() yields -1 for NULL arrays under the engine's
        # ANSI-off sessions, which leaked a bogus chunk row with
        # n_tokens=-1 for NULL-text docs (ADVICE r6) and skewed
        # sum(n_tokens) invariants downstream
        .withColumn("_n", F.greatest(F.size("_toks"), F.lit(0)))
        .withColumn(
            "chunk_idx",
            F.explode_outer(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.floor((F.col("_n") - 1) / stride).cast("int"),
                        F.lit(0),
                    ),
                )
            ),
        )
        .withColumn("tok_start", F.col("chunk_idx") * stride)
        .withColumn(
            "chunk_text",
            F.array_join(
                F.slice(F.col("_toks"), F.col("tok_start") + 1, chunk_tokens),
                " ",
            ),
        )
        .withColumn(
            "n_tokens",
            F.least(F.col("_n") - F.col("tok_start"), F.lit(chunk_tokens)),
        )
    )
    return out.select(
        id_col,
        "chunk_idx",
        "tok_start",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "chunk_text",
    )
