"""Multimodal plumbing tests: schema, Arrow batch dataflow, determinism."""

from syslog_ng_spark.operators import multimodal as MM


def test_synthetic_media_deterministic(spark):
    a = MM.synthetic_media(spark, n=20).orderBy("media_id").collect()
    b = MM.synthetic_media(spark, n=20).orderBy("media_id").collect()
    assert [r.payload for r in a] == [r.payload for r in b]
    assert all(r.meta.n_bytes == len(r.payload) for r in a)


def test_extract_features_shape(spark):
    df = MM.synthetic_media(spark, n=30)
    out = MM.extract_features(df, dim=8).collect()
    assert len(out) == 30
    assert all(len(r.feat) == 8 for r in out)
    assert all(r.decode_ok for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r.feat)
    # payload column dropped — bytes never travel past the decode stage
    assert "payload" not in MM.extract_features(df).columns


def test_frame_sample(spark):
    df = MM.synthetic_media(spark, n=30)
    frames = MM.frame_sample(df, every_ms=200)
    n_videos = df.filter("kind = 'video'").count()
    assert frames.count() == n_videos * 5  # 1000ms / 200ms
    assert "frame_ms" in frames.columns


def test_real_decoder_is_marked_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        MM.decode_image_real(b"bytes")


def test_audio_windows_shape(spark):
    from syslog_ng_spark.operators.multimodal import audio_windows, synthetic_media

    media = synthetic_media(spark, 60)
    w = audio_windows(media, window_ms=500, hop_ms=250)
    rows = w.collect()
    assert rows, "some audio rows exist"
    # duration 1000ms, window 500, hop 250 -> 3 windows per clip
    per_clip = {}
    for r in rows:
        per_clip.setdefault(r.media_id, []).append((r.win_start_ms, r.win_end_ms))
    for wins in per_clip.values():
        assert sorted(wins) == [(0, 500), (250, 750), (500, 1000)]
    assert "payload" not in w.columns  # bytes never multiply


def test_media_near_dup_finds_byte_identical(spark):
    from pyspark.sql import functions as F
    from syslog_ng_spark.operators.multimodal import media_near_dup, synthetic_media

    media = synthetic_media(spark, 40)
    dup = media.filter(F.col("media_id") == 7).withColumn(
        "media_id", F.lit(1007).cast("long")
    )
    pairs = media_near_dup(media.unionByName(dup)).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(7, 1007)}
