"""Streaming quality tagging: the rowwise Gopher projection and the
combined Gopher+C4 foreachBatch tagger — batch agreement plus
checkpoint-restart incremental processing."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    c4_line_clean,
    gopher_quality_signals,
)
from coa_ocr_simple_spark.streaming.quality_stream import (
    run_streaming_gopher,
    run_streaming_quality,
)


def _doc_rows(rows):
    return [
        {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for i, t in rows
    ]


TEXTS_B1 = [
    (1, "this is a perfectly normal sentence here.\nand another good one."),
    (2, "- one\n- two\n- three\n- four"),  # all bullets: gopher-bad
    (3, "dup line here\ndup line here\ndup line here\nother."),
]
TEXTS_B2 = [
    (4, "12 34 56 78 90"),  # no alpha words: gopher-bad
    (5, "\n".join(f"kept sentence number {k} stands alone." for k in range(6))),
]


def test_streaming_gopher_direct_sink_matches_batch_and_resumes(spark, tmp_path):
    inp = tmp_path / "docs"
    inp.mkdir()
    out = str(tmp_path / "gq_out")
    ckpt = str(tmp_path / "gq_ckpt")

    pq.write_table(pa.Table.from_pylist(_doc_rows(TEXTS_B1)), str(inp / "b1.parquet"))
    run_streaming_gopher(spark, str(inp), out, ckpt)
    got1 = {r["doc_id"]: tuple(r) for r in spark.read.parquet(out).collect()}
    assert set(got1) == {1, 2, 3}

    # restart: only the new file lands (no duplicated rows for 1-3)
    pq.write_table(pa.Table.from_pylist(_doc_rows(TEXTS_B2)), str(inp / "b2.parquet"))
    run_streaming_gopher(spark, str(inp), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    got = {r["doc_id"]: tuple(r) for r in rows}

    # row-for-row agreement with the oracle-checked batch form
    batch_df = spark.createDataFrame(
        _doc_rows(TEXTS_B1 + TEXTS_B2),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).select("doc_id", "text")
    want = {r["doc_id"]: tuple(r) for r in gopher_quality_signals(batch_df).collect()}
    assert got == want
    assert got[2][-1] == 1 and got[4][-1] == 1  # the designed bad docs
    assert got[1][-1] == 0 and got[5][-1] == 0


def test_streaming_quality_combined_tagger(spark, tmp_path):
    inp = tmp_path / "docs"
    inp.mkdir()
    out = str(tmp_path / "q_out")
    ckpt = str(tmp_path / "q_ckpt")

    pq.write_table(pa.Table.from_pylist(_doc_rows(TEXTS_B1)), str(inp / "b1.parquet"))
    run_streaming_quality(spark, str(inp), out, ckpt)
    pq.write_table(pa.Table.from_pylist(_doc_rows(TEXTS_B2)), str(inp / "b2.parquet"))
    run_streaming_quality(spark, str(inp), out, ckpt)

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    got = {r["doc_id"]: r for r in rows}

    docs = spark.createDataFrame(
        _doc_rows(TEXTS_B1 + TEXTS_B2),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    gq = {r["doc_id"]: r["is_gopher_bad"]
          for r in gopher_quality_signals(docs).collect()}
    c4 = {r["doc_id"]: (r["n_kept"], r["is_dropped"], r["text_clean"])
          for r in c4_line_clean(docs).collect()}
    for d in range(1, 6):
        assert got[d]["is_gopher_bad"] == gq[d]
        assert (
            got[d]["c4_n_kept"],
            got[d]["c4_is_dropped"],
            got[d]["c4_text_clean"],
        ) == c4[d]
    # idempotent replay sink shape: one subdirectory per batch
    batches = {r["batch"] for r in spark.read.parquet(out).select("batch").collect()}
    assert len(batches) == 2
