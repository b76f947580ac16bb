"""Streaming ANN ingest: stream-encoded rows are bit-identical to the
batch encoder on the same vectors, a restart processes only new files,
and ingested vectors are immediately searchable alongside the base."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as papq

from pyspark.sql import functions as F

from coa_ocr_simple_spark.jobs.ann_index import parse_args, run_build
from coa_ocr_simple_spark.plans.ann_index import (
    encode_frames,
    quantized,
    search_index_frames,
)
from coa_ocr_simple_spark.streaming.ann_ingest_stream import (
    ingested_codes,
    run_streaming_ann_ingest,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _code_rows(df):
    return sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in df.collect()
    )


_EMB_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
)


def _emb_table(rows):
    return pa.Table.from_pylist(rows, schema=_EMB_SCHEMA)


def _write_half(spark, parity, path):
    part = spark.read.parquet(EMB).where(F.col("vec_id") % 2 == parity)
    papq.write_table(
        _emb_table(
            [
                {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                for r in part.collect()
            ]
        ),
        path,
    )
    return part


def test_ann_ingest_stream_encodes_and_resumes(spark, tmp_path):
    # bulk index over the even half
    even_path = str(tmp_path / "even.parquet")
    _write_half(spark, 0, even_path)
    index = str(tmp_path / "index")
    run_build(
        parse_args(["build", "--embeddings", even_path, "--index", index]),
        spark,
    )

    # stream the odd half in as two arrival files
    inp = tmp_path / "arrivals"
    inp.mkdir()
    odd = spark.read.parquet(EMB).where(F.col("vec_id") % 2 == 1)
    odd_rows = [
        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
        for r in odd.collect()
    ]
    mid = len(odd_rows) // 2
    papq.write_table(_emb_table(odd_rows[:mid]), str(inp / "f1.parquet"))
    ckpt = str(tmp_path / "ckpt")
    run_streaming_ann_ingest(spark, str(inp), index, ckpt)
    got1 = spark.read.parquet(f"{index}/codes_stream")
    assert got1.count() == mid

    papq.write_table(_emb_table(odd_rows[mid:]), str(inp / "f2.parquet"))
    run_streaming_ann_ingest(spark, str(inp), index, ckpt)

    # stream-encoded rows == batch encoder over the same vectors,
    # against the same stored quantizer
    centroids = spark.read.parquet(f"{index}/centroids")
    codebook = spark.read.parquet(f"{index}/codebook")
    streamed = spark.read.parquet(f"{index}/codes_stream").drop("batch")
    expected = encode_frames(quantized(odd), centroids, codebook)
    assert _code_rows(streamed) == _code_rows(expected)
    spark.catalog.clearCache()

    # ingested vectors are searchable next to the base: self-hit rank 1
    all_codes = ingested_codes(spark, index)
    emb_all = quantized(spark.read.parquet(EMB))
    queries = emb_all.where(F.col("vec_id") % 2 == 1).limit(3)
    hits = search_index_frames(
        queries,
        centroids,
        codebook,
        all_codes,
        nprobe=2,
        rerank=32,
        vectors=emb_all,
    ).collect()
    spark.catalog.clearCache()
    top1 = {r["query_id"]: r["neighbor_id"] for r in hits if r["rank"] == 1}
    assert top1 and all(q == n for q, n in top1.items())


def test_compact_folds_stream_area_into_base(spark, tmp_path):
    """`compact`: stream-ingested rows move into the bulk codes table
    (dupes vs base dropped), the stream area is cleared, search results
    are unchanged, and a second compact is a no-op."""
    from coa_ocr_simple_spark.jobs.ann_index import parse_args as pa
    from coa_ocr_simple_spark.jobs.ann_index import run_compact

    even_path = str(tmp_path / "even.parquet")
    _write_half(spark, 0, even_path)
    index = str(tmp_path / "index")
    run_build(
        parse_args(["build", "--embeddings", even_path, "--index", index]),
        spark,
    )
    n_base = spark.read.parquet(f"{index}/codes").count()

    inp = tmp_path / "arrivals"
    inp.mkdir()
    odd = spark.read.parquet(EMB).where(F.col("vec_id") % 2 == 1)
    odd_rows = [
        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
        for r in odd.collect()
    ]
    papq.write_table(_emb_table(odd_rows), str(inp / "f1.parquet"))
    run_streaming_ann_ingest(spark, str(inp), index, str(tmp_path / "ck"))

    before = sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in ingested_codes(spark, index).collect()
    )

    # the search CLI reaches not-yet-compacted vectors via --include-stream
    from coa_ocr_simple_spark.jobs.ann_index import run_search

    hits_out = str(tmp_path / "hits")
    run_search(
        pa(
            ["search", "--index", index, "--queries", str(inp / "f1.parquet"),
             "--output", hits_out, "--nprobe", "2", "--include-stream"]
        ),
        spark,
    )
    got_ids = {
        (r["query_id"], r["neighbor_id"])
        for r in spark.read.parquet(hits_out).collect()
    }
    assert any(q == n for q, n in got_ids)  # streamed vectors searchable

    summary = run_compact(pa(["compact", "--index", index]), spark)
    assert summary == {"n_compacted": len(odd_rows), "stream_area": "cleared"}
    base_after = spark.read.parquet(f"{index}/codes")
    assert base_after.count() == n_base + len(odd_rows)
    # the union view sees exactly the same rows as before compaction
    after = sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in ingested_codes(spark, index).collect()
    )
    assert after == before
    # idempotent: nothing left to fold
    assert run_compact(pa(["compact", "--index", index]), spark) == {
        "n_compacted": 0,
        "stream_area": "absent",
    }
