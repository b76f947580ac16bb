"""Opaque-binary multimodal plumbing: binary payloads round-trip Arrow,
resize/frame-sample/audio-window shapes are deterministic, fan-out stays
inside the source partition, and the real codec is import-gated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coa_ocr_simple_spark.operators.multimodal_binary import (
    ASSETS,
    DeterministicImageCodec,
    RealImageCodec,
    audio_windows,
    resize_images,
    sample_frames,
    synth_payload,
)


def _assets(spark):
    rows = []
    for i in range(6):
        aid = f"img-{i}"
        w, h = 64 + i, 48 + i
        rows.append(
            (aid, "image", synth_payload(aid, w * h),
             {"width": w, "height": h, "sample_rate": None,
              "duration_ms": None, "n_frames": None})
        )
    for i in range(3):
        aid = f"vid-{i}"
        n_frames = 30 + 10 * i
        rows.append(
            (aid, "video", synth_payload(aid, n_frames * 100),
             {"width": 32, "height": 32, "sample_rate": None,
              "duration_ms": 2000, "n_frames": n_frames})
        )
    for i in range(3):
        aid = f"aud-{i}"
        rate, dur = 8000, 2500 + 500 * i  # 2.5-3.5 s
        rows.append(
            (aid, "audio", synth_payload(aid, rate * dur // 1000 * 2),
             {"width": None, "height": None, "sample_rate": rate,
              "duration_ms": dur, "n_frames": None})
        )
    return spark.createDataFrame(rows, ASSETS).repartition(4, "asset_id")


def test_resize_images_shapes_and_determinism(spark):
    assets = _assets(spark)
    out = resize_images(assets, 16, 12).collect()
    assert len(out) == 6  # images only
    for r in out:
        assert (r["width"], r["height"]) == (16, 12)
        assert 0 < r["n_bytes"] <= 16 * 12
        assert len(r["payload"]) == r["n_bytes"]
    # deterministic: a second run produces byte-identical payloads
    again = {r["asset_id"]: bytes(r["payload"]) for r in resize_images(assets, 16, 12).collect()}
    assert {r["asset_id"]: bytes(r["payload"]) for r in out} == again


def test_sample_frames_fanout_and_bounds(spark):
    assets = _assets(spark)
    frames = sample_frames(assets, every_nth=10).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 30/40/50 frames sampled every 10th -> 3/4/5 rows
    assert {k: len(v) for k, v in by_asset.items()} == {
        "vid-0": 3, "vid-1": 4, "vid-2": 5,
    }
    for rows in by_asset.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(
            range(0, 10 * len(rows), 10)
        )
        assert all(len(r["frame_payload"]) > 0 for r in rows)


def test_audio_windows_counts(spark):
    assets = _assets(spark)
    wins = audio_windows(assets, window_ms=1000).collect()
    by_asset = {}
    for r in wins:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 2500/3000/3500 ms -> 3/3/4 windows of <=1s
    assert {k: len(v) for k, v in by_asset.items()} == {
        "aud-0": 3, "aud-1": 3, "aud-2": 4,
    }
    # last window is the short remainder
    a0 = sorted(by_asset["aud-0"], key=lambda r: r["window_idx"])
    assert [r["n_samples"] for r in a0] == [8000, 8000, 4000]


def test_transforms_preserve_partitioning(spark):
    """mapInPandas must not shuffle: the number of partitions (and the
    absence of any Exchange below the map) is the contract that lets a
    media pipeline scale without moving payload bytes."""
    assets = _assets(spark)
    out = resize_images(assets, 8, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0], plan


def test_real_codec_is_gated():
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        RealImageCodec()
    else:
        with pytest.raises(NotImplementedError):
            RealImageCodec()


def test_deterministic_codec_is_pure():
    codec = DeterministicImageCodec()
    p = synth_payload("x", 64 * 48)
    assert codec.resize(p, 64, 48, 16, 12) == codec.resize(p, 64, 48, 16, 12)
    assert codec.resize(p, 0, 0, 16, 12) == b""


def test_embed_binary_bridges_to_embedding_ops(spark):
    """binary -> embedding feature extraction: stable schema, content-
    keyed determinism (identical payloads embed identically), values in
    [-1, 1], no Exchange below the map — and the output frame slots
    straight into the cosine-similarity machinery (the planted duplicate
    payload is its twin's nearest neighbor at similarity 1.0)."""
    from coa_ocr_simple_spark.operators.multimodal_binary import embed_binary

    assets = _assets(spark)
    # plant a byte-identical twin of img-0 under a different id
    twin = spark.createDataFrame(
        [("img-0-copy", "image", synth_payload("img-0", 64 * 48),
          {"width": 64, "height": 48, "sample_rate": None,
           "duration_ms": None, "n_frames": None})],
        ASSETS,
    )
    emb = embed_binary(assets.unionByName(twin), dim=16)
    plan = emb._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0], plan

    rows = {r["asset_id"]: r for r in emb.collect()}
    assert len(rows) == 13
    for r in rows.values():
        assert r["dim"] == 16 and len(r["embedding"]) == 16
        assert all(-1.0 <= v <= 1.0 for v in r["embedding"])
    assert rows["img-0"]["embedding"] == rows["img-0-copy"]["embedding"]
    # run-to-run determinism
    again = {r["asset_id"]: r["embedding"] for r in emb.collect()}
    assert {k: r["embedding"] for k, r in rows.items()} == again

    # bridge into the similarity world: exact cosine top-1 of img-0 is
    # its byte-twin (the embedding_neardup/semdedup input shape)
    left = emb.where(F.col("asset_id") == "img-0").select(
        F.col("embedding").alias("e1")
    )
    others = emb.where(F.col("asset_id") != "img-0").select(
        "asset_id", F.col("embedding").alias("e2")
    )
    dot = F.aggregate(
        F.zip_with("e1", "e2", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda v: v * v), F.lit(0.0), lambda a, v: a + v
        )
    )
    top = (
        left.crossJoin(others)
        .select(
            "asset_id",
            (dot / (norm(F.col("e1")) * norm(F.col("e2")))).alias("cos"),
        )
        .orderBy(F.desc("cos"))
        .first()
    )
    assert top["asset_id"] == "img-0-copy"
    assert abs(top["cos"] - 1.0) < 1e-6
