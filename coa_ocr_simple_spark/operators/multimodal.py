"""Multimodal column plumbing — decode / feature-extract over opaque media.

Media payloads are opaque references (``media_ref``) with typed metadata;
at 100 TB the image/audio bytes live in object storage and only flow
through ``mapInPandas`` batches on the executors.  The Spark-side
machinery here — schema, Arrow batch iteration, partition-preserving
plan — is real and tested; the *pixel/sample decode itself* is pluggable
because the decode libraries (PIL/ffmpeg) are not in this container:

- ``RealImageDecoder`` raises NotImplementedError unless PIL imports
  (clearly-marked stub boundary);
- ``DeterministicFeatureExtractor`` (default in tests/bench) derives a
  fixed-length feature vector from the payload bytes via md5 — stable,
  engine-independent, exercises the exact batch shapes a real extractor
  would see.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("total_chars", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_FEATURE_DIM = 16


class DeterministicFeatureExtractor:
    """Deterministic fake: 16 floats in [0,1) from the md5 of the payload.
    Stands in for an image/audio embedding model; same signature, same
    batch shape."""

    def features(self, payload: bytes) -> list[float]:
        digest = hashlib.md5(payload).digest()
        return [b / 255.0 for b in digest[:_FEATURE_DIM]]


class RealImageDecoder:
    """Production decode path — requires PIL, absent in this sandbox."""

    def __init__(self) -> None:
        try:
            from PIL import Image  # noqa: F401

            self._available = True
        except ImportError:
            self._available = False

    def features(self, payload: bytes) -> list[float]:
        if not self._available:
            raise NotImplementedError(
                "image decode requires PIL; use DeterministicFeatureExtractor "
                "in environments without decode libraries"
            )
        raise NotImplementedError("resize/embed pipeline: plug model here")


def media_features(media: DataFrame, extractor=None) -> DataFrame:
    """media(media_ref, pages, ocr_pages) -> per-media feature rows.

    mapInPandas keeps the operation partition-preserving (no shuffle) and
    Arrow-batched; a fat document's media rows are already spread by the
    upstream layout.
    """
    extractor = extractor or DeterministicFeatureExtractor()

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, pages, ocr_pages in zip(
                pdf["media_ref"], pdf["pages"], pdf["ocr_pages"]
            ):
                all_pages = (list(pages) if pages is not None else []) + (
                    list(ocr_pages) if ocr_pages is not None else []
                )
                payload = "\x00".join(all_pages).encode("utf-8", "replace")
                out.append(
                    {
                        "media_ref": ref,
                        "n_pages": len(all_pages),
                        "total_chars": sum(len(p) for p in all_pages),
                        "content_hash": hashlib.md5(payload).hexdigest(),
                        "features": extractor.features(payload),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_FEATURES.fields]
            )

    return media.mapInPandas(compute, MEDIA_FEATURES)
