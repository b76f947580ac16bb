"""Streaming BM25 standing-query routing: per-doc scores are identical
to the batch scorer (dl is a per-doc property; every corpus-global
statistic rides the static model row), a checkpoint restart processes
only new files, and replays stay idempotent via batch-keyed dirs."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as papq

from pyspark.sql import functions as F

from coa_ocr_simple_spark.plans.driver_queries_corpus import (
    bm25_model,
    bm25_score,
)
from coa_ocr_simple_spark.streaming.bm25_stream import run_streaming_bm25

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["score_micro"]) for r in df.collect()
    )


def test_bm25_stream_matches_batch_and_resumes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mp = str(tmp_path / "model.parquet")
    bm25_model(docs).write.parquet(mp)
    model = spark.read.parquet(mp)

    # split the corpus into two arrival files
    inp = tmp_path / "docs"
    inp.mkdir()
    first_half = docs.where(F.col("doc_id") % 2 == 0)
    second_half = docs.where(F.col("doc_id") % 2 == 1)
    papq.write_table(
        pa.Table.from_pylist([r.asDict() for r in first_half.collect()]),
        str(inp / "b1.parquet"),
    )
    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_bm25(spark, str(inp), mp, out, ckpt)
    got1 = _rows(spark.read.parquet(out))
    assert got1 == _rows(bm25_score(first_half, model))

    # restart with the second file: only new docs are scored, and the
    # accumulated output equals the batch scorer over the full corpus
    papq.write_table(
        pa.Table.from_pylist([r.asDict() for r in second_half.collect()]),
        str(inp / "b2.parquet"),
    )
    run_streaming_bm25(spark, str(inp), mp, out, ckpt)
    got_all = _rows(spark.read.parquet(out))
    assert got_all == _rows(bm25_score(docs, model))
    assert len(got_all) > len(got1)
