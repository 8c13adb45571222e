"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake derived from the bytes — clearly marked); everything
around it — schema, Arrow batch shape, ``mapInPandas`` plumbing,
partition sizing — is real and tested, so swapping in a real decoder
(PIL/torchaudio) is a one-function change.

Pattern: wide binary payloads ride in their own column; metadata is a
typed struct so filters/pruning never touch the bytes. ``mapInPandas``
keeps the bytes inside Arrow record batches (zero-copy into pandas).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from sha2 of
    the id — stable across runs, no external data."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512)
        .cast("binary")
        .alias("payload"),
    )
    return df.withColumn(
        "meta",
        F.struct(
            F.concat(F.lit("application/x-fake-"), F.col("kind")).alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(1000).alias("duration_ms"),
        ),
    )


_FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<float>, decode_ok boolean"
)


def _fake_decode(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """STUB decoder: real systems put PIL/librosa here. The fake derives a
    deterministic feature vector from the payload bytes so tests can
    assert end-to-end dataflow without codecs."""
    if payload is None:
        return None
    import hashlib  # noqa: PLC0415

    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(df: DataFrame, dim: int = 8, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media via ``mapInPandas`` (Arrow batches).

    The binary column crosses into Python exactly once per batch; the
    output drops the payload so downstream stages never reshuffle bytes.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_decode(p, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "decode_ok": feats.notna(),
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame sampling STUB: emits one row per sampled frame index,
    computed from meta.duration_ms — the explode shape is real (rows
    multiply), the decoded frame is a NotImplementedError placeholder."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            # explode_outer: identical here (the sequence is never
            # empty) but avoids InferFiltersFromGenerate re-building the
            # index array in a pushed filter (operators/decontaminate.py)
            F.explode_outer(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
        )
        .withColumn("frame_ms", F.col("frame_idx") * every_ms)
        .drop("payload")
    )


def decode_image_real(payload: bytes):  # pragma: no cover - container lacks codecs
    """Real decoder slot — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "swap _fake_decode with PIL.Image.open in deployment"
    )


def audio_windows(df: DataFrame, window_ms: int = 500, hop_ms: int = 250) -> DataFrame:
    """Audio windowing STUB: one row per (overlapping) analysis window
    computed from meta.duration_ms — the explode shape and window
    arithmetic are real; the per-window sample decode is the same
    placeholder slot as frames."""
    n_hops = ((F.col("meta.duration_ms") - window_ms) / hop_ms + 1).cast("int")
    return (
        df.filter(F.col("kind") == "audio")
        .withColumn(
            "win_idx",
            # explode_outer: see frame_sample
            F.explode_outer(F.sequence(F.lit(0), F.greatest(n_hops - 1, F.lit(0)))),
        )
        .withColumn("win_start_ms", F.col("win_idx") * hop_ms)
        .withColumn("win_end_ms", F.col("win_idx") * hop_ms + window_ms)
        .drop("payload")
    )


def media_near_dup(
    df: DataFrame,
    threshold: float = 0.99,
    dim: int = 8,
    max_gather_ids: int = 1_000_000,
) -> DataFrame:
    """Near-duplicate media pairs: decode→featurize (mapInPandas), then
    the embedding near-dup machinery over the feature vectors — the
    LLM-pipeline composition (dedup training media before captioning).
    With the stub decoder, byte-identical payloads featurize identically
    (cos 1.0); a real decoder makes this perceptual. ``max_gather_ids``
    bounds the verify's driver-side gather (see ``embedding_near_dup``)."""
    from .similarity import embedding_near_dup  # noqa: PLC0415

    feats = (
        extract_features(df, dim=dim)
        .filter(F.col("decode_ok"))
        .select(F.col("media_id").alias("vec_id"), F.col("feat").cast("array<double>").alias("embedding"))
    )
    return embedding_near_dup(
        feats, threshold=threshold, n_planes=4, dim=dim, n_tables=8,
        max_gather_ids=max_gather_ids,
    )
