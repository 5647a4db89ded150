"""Multimodal plumbing tests: schemas, Arrow batch shapes, fan-out, and
payload-dropping contracts (decode kernels are deterministic fakes — the
container ships no codecs)."""

from __future__ import annotations

import pytest

from hoops_edge_database_etl_spark.operators.multimodal import (
    attach_media_meta,
    decode_and_featurize,
    frame_sample_stub,
    media_features_to_embedding_table,
    pack_fake_image,
    resize_stub,
)


@pytest.fixture()
def media_df(spark):
    rows = [(i, pack_fake_image(i, 640 + i, 480 + i)) for i in range(6)]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_attach_meta_without_decoding(spark, media_df):
    out = attach_media_meta(media_df)
    rows = {r["media_id"]: (r["media_type"], r["width"], r["height"]) for r in out.collect()}
    assert rows[0] == ("image", 640, 480)
    assert rows[5] == ("image", 645, 485)
    # metadata extraction is expression-only: no Python in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_decode_and_featurize_drops_payload(spark, media_df):
    feat = decode_and_featurize(media_df)
    assert "media" not in feat.columns  # payload dies at the decode stage
    rows = {r["media_id"]: r for r in feat.collect()}
    assert len(rows) == 6
    assert rows[3]["width"] == 643 and rows[3]["height"] == 483
    assert len(rows[3]["features"]) == 8
    # determinism: same input → same features
    again = {r["media_id"]: r["features"] for r in decode_and_featurize(media_df).collect()}
    assert again[3] == rows[3]["features"]


def test_decode_skips_corrupt_payloads(spark):
    rows = [(1, pack_fake_image(1, 10, 10)), (2, b"NOTANIMAGE" + bytes(8))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = decode_and_featurize(df).collect()
    assert [r["media_id"] for r in out] == [1]


def test_resize_rewrites_header_keeps_schema(spark, media_df):
    resized = resize_stub(media_df, target_w=224, target_h=224)
    assert resized.schema == media_df.schema
    meta = attach_media_meta(resized)
    assert {(r["width"], r["height"]) for r in meta.collect()} == {(224, 224)}


def test_frame_sample_fanout(spark, media_df):
    frames = frame_sample_stub(media_df, every_n=8, n_frames=32)
    assert frames.columns == ["media_id", "frame_index", "frame_bytes"]
    per_doc = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)  # 32/8 samples each
    idx = {r["frame_index"] for r in frames.collect()}
    assert idx == {0, 8, 16, 24}


def test_features_bridge_to_similarity_ops(spark, media_df):
    emb = media_features_to_embedding_table(decode_and_featurize(media_df))
    assert dict(emb.dtypes) == {"vec_id": "bigint", "embedding": "array<float>"}
    assert emb.count() == 6


def test_pil_decoder_is_import_gated(spark, media_df):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL not available"):
        decode_and_featurize(media_df, decoder="pil")


def test_raw_rgb_roundtrip_and_resize_math(spark):
    """The resize kernel runs REAL pixel math: a known 4x4 pattern
    downsampled 2x must select the center-aligned nearest pixels, and
    same-size resize must be the identity."""
    import numpy as np

    from hoops_edge_database_etl_spark.operators.multimodal import (
        decode_raw_rgb,
        resize_rgb,
    )

    # hand-built 4x4 image: pixel (y,x) = (y*16, x*16, 0)
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(4):
            img[y, x] = (y * 16, x * 16, 0)
    import struct as _s

    raw = _s.pack("<4sii", b"FRGB", 4, 4) + img.tobytes()
    df = spark.createDataFrame([(1, bytearray(raw))], "media_id long, media binary")

    out = resize_rgb(df, target_w=2, target_h=2).collect()[0]["media"]
    got = decode_raw_rgb(bytes(out))
    # center-aligned nearest for 4->2: src index floor((i+0.5)*2) = 1, 3
    want = img[[1, 3]][:, [1, 3]]
    assert (got == want).all()

    # identity at same size
    same = resize_rgb(df, target_w=4, target_h=4).collect()[0]["media"]
    assert (decode_raw_rgb(bytes(same)) == img).all()


def test_rgb_channel_stats_match_numpy(spark):
    import numpy as np

    from hoops_edge_database_etl_spark.operators.multimodal import (
        decode_raw_rgb,
        pack_raw_rgb,
        rgb_channel_stats,
    )

    raws = [pack_raw_rgb(i, 8, 6) for i in range(3)]
    df = spark.createDataFrame(
        [(i, bytearray(r)) for i, r in enumerate(raws)], "media_id long, media binary"
    )
    rows = {r["media_id"]: r for r in rgb_channel_stats(df).collect()}
    for i, raw in enumerate(raws):
        img = decode_raw_rgb(raw).astype(np.float64)
        r = rows[i]
        assert r["width"] == 8 and r["height"] == 6
        assert abs(r["mean_r"] - img[:, :, 0].mean()) < 1e-9
        assert abs(r["std_gray"] - img.mean(axis=2).std()) < 1e-9


def test_decode_raw_rgb_rejects_corrupt(spark):
    import pytest as _pytest

    from hoops_edge_database_etl_spark.operators.multimodal import (
        decode_raw_rgb,
        pack_raw_rgb,
    )

    with _pytest.raises(ValueError):
        decode_raw_rgb(b"XXXX" + b"\x00" * 20)
    with _pytest.raises(ValueError):
        decode_raw_rgb(pack_raw_rgb(1, 4, 4)[:-5])  # truncated payload
    with _pytest.raises(ValueError):
        decode_raw_rgb(b"FRGB\x04")  # shorter than the header itself


def test_pcm16_round_trip_and_byte_order(spark):
    """pack_pcm16 → pcm16_features recovers exact features; a byte-order
    corruption is detectable (RMS changes)."""
    import numpy as np

    from hoops_edge_database_etl_spark.operators.multimodal import (
        pack_pcm16,
        pcm16_features,
    )

    samples = [100, -200, 300, -400, 0, 5]
    df = spark.createDataFrame(
        [(1, bytearray(pack_pcm16(samples)))], "media_id long, pcm binary"
    )
    r = pcm16_features(df).collect()[0]
    arr = np.array(samples, dtype=np.int64)
    assert r["n_samples"] == len(samples)
    assert r["peak"] == 400
    assert r["zero_crossings"] == int(((arr[:-1] * arr[1:]) < 0).sum())
    assert abs(r["rms"] - float(np.sqrt((arr * arr).sum() / len(arr)))) < 1e-12
    # big-endian repack must NOT produce the same features
    be = np.asarray(samples, dtype=">i2").tobytes()
    df2 = spark.createDataFrame([(1, bytearray(be))], "media_id long, pcm binary")
    r2 = pcm16_features(df2).collect()[0]
    assert r2["rms"] != r["rms"]


def test_video_frame_sample_slices_correct_frames(spark):
    """q146 returns only every-2nd frame and its means match the pixel
    generator formula recomputed driver-side."""
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import (
        VID_EVERY,
        VID_H,
        VID_N,
        VID_W,
    )
    from tests.conftest import SF_DIR

    rows = all_queries()["q146_video_frame_sample"](spark, SF_DIR).collect()
    assert rows
    assert {r["frame_index"] for r in rows} == set(range(0, VID_N, VID_EVERY))
    npx = VID_H * VID_W
    for r in rows[:16]:
        base = r["media_id"] * 7 + r["frame_index"] * 13
        want_r = sum((base + o * 3) % 256 for o in range(npx)) / npx
        want_b = sum((base + o * 3 + 2) % 256 for o in range(npx)) / npx
        assert r["mean_r"] == want_r
        assert r["mean_b"] == want_b
