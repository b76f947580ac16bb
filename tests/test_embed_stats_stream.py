"""Streaming embedding drift monitor: the moments-based running answer
is bit-identical to the batch embedding_label_stats over the union of
everything streamed (under an arbitrary file split), a restart
processes only new files, and the state stays O(labels * dim)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as papq

from pyspark.sql import functions as F

from coa_ocr_simple_spark.plans.driver_queries_ext import (
    embedding_label_stats,
)
from coa_ocr_simple_spark.streaming.embed_stats_stream import (
    label_stats_estimate,
    run_streaming_embed_stats,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"

_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)


def _rows_of(df):
    return sorted(
        (
            r["label"],
            r["n_vectors"],
            r["mean_sq_norm"],
            tuple(r["centroid_m"]),
            r["msd"],
        )
        for r in df.collect()
    )


def test_embed_stats_stream_matches_batch_and_resumes(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    rows = [
        {
            "vec_id": r["vec_id"],
            "embedding": list(r["embedding"]),
            "label": r["label"],
        }
        for r in emb.collect()
    ]
    mid = len(rows) // 3  # deliberately uneven split
    inp = tmp_path / "arrivals"
    inp.mkdir()
    papq.write_table(
        pa.Table.from_pylist(rows[:mid], schema=_SCHEMA),
        str(inp / "f1.parquet"),
    )
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_embed_stats(spark, str(inp), state, ckpt)

    # running answer over the first slice == batch over the same slice
    first = emb.limit(0).unionByName(
        emb.join(
            spark.createDataFrame(
                [(r["vec_id"],) for r in rows[:mid]], ["vec_id"]
            ),
            "vec_id",
            "left_semi",
        )
    )
    got1 = _rows_of(label_stats_estimate(spark, state))
    spark.catalog.clearCache()
    assert got1 == _rows_of(embedding_label_stats(first))
    spark.catalog.clearCache()

    # stream the rest; the union answer must equal the full batch query
    papq.write_table(
        pa.Table.from_pylist(rows[mid:], schema=_SCHEMA),
        str(inp / "f2.parquet"),
    )
    run_streaming_embed_stats(spark, str(inp), state, ckpt)
    got_all = _rows_of(label_stats_estimate(spark, state))
    spark.catalog.clearCache()
    assert got_all == _rows_of(embedding_label_stats(emb))
    spark.catalog.clearCache()

    # state is bounded: at most (dim + 2) rows per label per batch
    n_labels = emb.select("label").distinct().count()
    dim = len(rows[0]["embedding"])
    state_rows = spark.read.parquet(state).count()
    assert state_rows <= 2 * n_labels * (dim + 2)
