"""Streaming BPE tokenization: per-doc parity with the batch encoder
and the driver-side reference, restart continuation, idempotent sink."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.plans.bpe import bpe_encode
from coa_ocr_simple_spark.streaming.tokenize_stream import (
    load_merges,
    run_streaming_tokenize,
)

MERGES = [("l", "o", 9), ("lo", "w", 7), ("e", "r", 5)]


def _doc_rows(rows):
    return [
        {"doc_id": i, "text": t, "lang": "en", "source": "s",
         "n_chars": len(t)}
        for i, t in rows
    ]


def _write_merges(tmp_path):
    mp = str(tmp_path / "merges.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"merge_rank": r, "a": a, "b": b, "weight": w}
                for r, (a, b, w) in enumerate(MERGES)
            ]
        ),
        mp,
    )
    return mp


def test_tokenize_stream_encodes_and_resumes(spark, tmp_path):
    mp = _write_merges(tmp_path)
    assert load_merges(spark, mp) == MERGES

    inp = tmp_path / "docs"
    inp.mkdir()
    out = str(tmp_path / "tokens")
    ckpt = str(tmp_path / "ckpt")

    texts1 = [(1, "low lower lowest"), (2, "hello world")]
    pq.write_table(
        pa.Table.from_pylist(_doc_rows(texts1)), str(inp / "b1.parquet")
    )
    run_streaming_tokenize(spark, str(inp), mp, out, ckpt)
    first = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {1, 2}
    for i, t in texts1:
        want = [tok for w in t.split() for tok in bpe_encode(w, MERGES)]
        assert list(first[i]["tokens"]) == want
        assert first[i]["n_tokens"] == len(want)

    # restart: only the new file is processed; batch dirs accumulate
    texts2 = [(3, "slower flow")]
    pq.write_table(
        pa.Table.from_pylist(_doc_rows(texts2)), str(inp / "b2.parquet")
    )
    run_streaming_tokenize(spark, str(inp), mp, out, ckpt)
    final = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(final) == {1, 2, 3}
    want3 = [tok for w in "slower flow".split()
             for tok in bpe_encode(w, MERGES)]
    assert list(final[3]["tokens"]) == want3
    batches = {
        r["batch"] for r in spark.read.parquet(out).select("batch").collect()
    }
    assert len(batches) == 2
