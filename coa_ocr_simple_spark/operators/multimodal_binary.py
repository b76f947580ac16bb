"""Opaque-binary multimodal columns: decode / resize / frame-sample /
audio-window plumbing over ``binary`` payloads with typed metadata.

The training-data-pipeline shape for images/audio/video at 100 TB:
payloads are opaque ``binary`` columns (or object-store references)
with a typed metadata struct; every transform is an Arrow-batched
``mapInPandas`` that PRESERVES partitioning (no shuffle — the only wide
operation in a media pipeline should be an explicit repartition on
asset_id when upstream layout is skewed).

The decode kernels themselves are pluggable: PIL/ffmpeg are not in this
container, so the default codecs are deterministic byte-level stand-ins
(clearly marked; RealImageCodec raises NotImplementedError without PIL).
What IS real and tested: the schemas, the binary-through-Arrow round
trip, the batch iteration, the explode fan-out shape of frame sampling,
and the metadata bookkeeping a real codec would update.

asset schema:
    assets(asset_id string, kind string in ('image','audio','video'),
           payload binary,
           meta struct<width int, height int, sample_rate int,
                       duration_ms int, n_frames int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

ASSETS = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", META),
    ]
)


def synth_payload(asset_id: str, n_bytes: int) -> bytes:
    """Deterministic pseudo-random bytes: md5 counter stream keyed by
    asset_id — reproducible test/bench payloads with no external data."""
    out = bytearray()
    counter = 0
    while len(out) < n_bytes:
        out += hashlib.md5(f"{asset_id}|{counter}".encode()).digest()
        counter += 1
    return bytes(out[:n_bytes])


# --- codecs (pluggable; deterministic stand-ins by default) ------------------------------


class DeterministicImageCodec:
    """Byte-level stand-in for an image codec: 'resize' keeps every k-th
    byte of the raster (k = area ratio), which preserves determinism and
    exercises the exact payload/metadata flow a PIL resize would."""

    def resize(self, payload: bytes, w: int, h: int, new_w: int, new_h: int) -> bytes:
        if w <= 0 or h <= 0 or new_w <= 0 or new_h <= 0:
            return b""
        k = max((w * h) // max(new_w * new_h, 1), 1)
        return payload[::k][: new_w * new_h]


class RealImageCodec:
    """Production plug-point — requires PIL, absent in this sandbox."""

    def __init__(self) -> None:
        try:
            from PIL import Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "image resize requires PIL; use DeterministicImageCodec in "
                "environments without decode libraries"
            )

    def resize(self, payload, w, h, new_w, new_h):  # pragma: no cover
        raise NotImplementedError("decode -> Image.resize -> re-encode here")


# --- operators ---------------------------------------------------------------------------

RESIZED = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(
    assets: DataFrame, new_w: int, new_h: int, codec=None
) -> DataFrame:
    """images -> resized payload + updated dimensions; partition-
    preserving mapInPandas, non-image rows dropped by a pushed filter."""
    codec = codec or DeterministicImageCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.meta is None or r.payload is None:
                    continue  # one bad row must not kill a 10^12-doc job
                out = codec.resize(
                    bytes(r.payload),
                    r.meta["width"] or 0,
                    r.meta["height"] or 0,
                    new_w,
                    new_h,
                )
                rows.append(
                    {
                        "asset_id": r.asset_id,
                        "payload": out,
                        "width": new_w,
                        "height": new_h,
                        "n_bytes": len(out),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return assets.where(assets.kind == "image").mapInPandas(run, RESIZED)


FRAMES = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(assets: DataFrame, every_nth: int = 10) -> DataFrame:
    """video -> one row per SAMPLED frame (every_nth), the fan-out shape
    of a frame-level training pipeline.  The deterministic stand-in
    slices the payload into meta.n_frames equal chunks; a real ffmpeg
    codec would emit decoded frames with identical row shape.  Fan-out is
    bounded by n_frames/every_nth per asset — a fat video explodes within
    its own partition, never across a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.meta is None or r.payload is None:
                    continue  # defensive: bad rows skipped, never fatal
                n = int(r.meta["n_frames"] or 0)
                if n <= 0:
                    continue
                payload = bytes(r.payload)
                size = max(len(payload) // n, 1)
                for idx in range(0, n, every_nth):
                    frame = payload[idx * size : (idx + 1) * size]
                    rows.append(
                        {
                            "asset_id": r.asset_id,
                            "frame_idx": idx,
                            "frame_payload": frame,
                            "frame_hash": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES.fields])

    return assets.where(assets.kind == "video").mapInPandas(run, FRAMES)


WINDOWS = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("window_hash", StringType()),
    ]
)


def audio_windows(assets: DataFrame, window_ms: int = 1000) -> DataFrame:
    """audio -> fixed-duration analysis windows (window_idx, n_samples) —
    the framing step before any acoustic featurizer; sample counts come
    from metadata (sample_rate, duration_ms), hashes from the windowed
    payload bytes (2 bytes/sample stand-in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.meta is None or r.payload is None:
                    continue  # defensive: bad rows skipped, never fatal
                rate = int(r.meta["sample_rate"] or 0)
                dur = int(r.meta["duration_ms"] or 0)
                if rate <= 0 or dur <= 0:
                    continue
                payload = bytes(r.payload)
                per_window = rate * window_ms // 1000
                n_windows = (dur + window_ms - 1) // window_ms
                for idx in range(n_windows):
                    remaining_ms = min(window_ms, dur - idx * window_ms)
                    n_samples = rate * remaining_ms // 1000
                    chunk = payload[
                        idx * per_window * 2 : (idx * per_window + n_samples) * 2
                    ]
                    rows.append(
                        {
                            "asset_id": r.asset_id,
                            "window_idx": idx,
                            "n_samples": n_samples,
                            "window_hash": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WINDOWS.fields])

    return assets.where(assets.kind == "audio").mapInPandas(run, WINDOWS)


# --- feature extraction (binary -> embedding) ---------------------------------------------


class DeterministicEmbedder:
    """Byte-level stand-in for a learned encoder (CLIP/wav2vec plug
    shape): D float dims derived from the payload's md5 counter stream,
    quantized to millis so values are bit-stable across hosts.  Content-
    keyed (identical payloads embed identically), which is exactly the
    property the downstream near-dup/ANN operators exploit."""

    def __init__(self, dim: int = 16) -> None:
        self.dim = dim

    def embed(self, payload: bytes) -> list[float]:
        h = hashlib.md5(payload).hexdigest()
        out = []
        for d in range(self.dim):
            v = int.from_bytes(
                hashlib.md5(f"{h}|{d}".encode()).digest()[:4], "big"
            )
            out.append((v % 2001 - 1000) / 1000.0)
        return out


class RealEmbedder:
    """Production plug-point — requires a model runtime (torch/onnx),
    absent in this sandbox."""

    def __init__(self) -> None:
        try:
            import torch  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "learned embeddings require a model runtime; use "
                "DeterministicEmbedder in environments without one"
            )

    def embed(self, payload):  # pragma: no cover
        raise NotImplementedError("decode -> encoder forward -> pooled vector")


def _embedded_schema(dim: int) -> StructType:
    from pyspark.sql.types import ArrayType, FloatType

    return StructType(
        [
            StructField("asset_id", StringType()),
            StructField("kind", StringType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("dim", IntegerType()),
        ]
    )


def embed_binary(assets: DataFrame, embedder=None, dim: int = 16) -> DataFrame:
    """assets -> (asset_id, kind, embedding array<float>, dim): the
    feature-extract step that bridges the opaque-binary world into the
    embedding operators (semdedup_prune, embedding_neardup, ann_*) —
    their input is exactly this frame's (id, array<float>) shape.

    Partition-preserving mapInPandas like every transform in this
    module: at 100 TB the encoder forward pass is the cost, so the plan
    must never move payload bytes through a shuffle to reach it; any
    repartition happens on the tiny (asset_id, embedding) OUTPUT."""
    embedder = embedder or DeterministicEmbedder(dim)
    schema = _embedded_schema(dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.payload is None:
                    continue  # defensive: bad rows skipped, never fatal
                rows.append(
                    {
                        "asset_id": r.asset_id,
                        "kind": r.kind,
                        "embedding": embedder.embed(bytes(r.payload)),
                        "dim": embedder.dim,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return assets.mapInPandas(run, schema)
