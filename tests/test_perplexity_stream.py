"""Stream-static perplexity scoring: docs are scored incrementally
against a static bigram-LM count table; scores match the batch formula
and a checkpoint restart processes only new files."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _LM_UNSEEN_BITS,
    lm_train_counts,
)
from coa_ocr_simple_spark.streaming.perplexity_stream import (
    run_streaming_perplexity,
)


def _doc_rows(rows):
    return [
        {"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
        for i, t in rows
    ]


REF = "alpha beta gamma delta " * 20  # the clean reference corpus text


def test_stream_scores_and_resumes(spark, tmp_path):
    ref_path = str(tmp_path / "ref.parquet")
    pq.write_table(
        pa.Table.from_pylist(_doc_rows([(1000, REF), (1001, REF)])), ref_path
    )
    counts_path = str(tmp_path / "lm_counts.parquet")
    lm_train_counts(spark.read.parquet(ref_path)).write.parquet(counts_path)

    inp = tmp_path / "docs"
    inp.mkdir()
    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: a fluent doc (reference bigrams) and a fully-alien doc
    pq.write_table(
        pa.Table.from_pylist(
            _doc_rows(
                [(1, "alpha beta gamma delta alpha beta"),
                 (2, "zz qq xx pp zz qq")]
            )
        ),
        str(inp / "b1.parquet"),
    )
    run_streaming_perplexity(spark, str(inp), counts_path, out, ckpt)
    first = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {1, 2}  # EVERY doc is scored (not just flagged)
    assert first[1]["is_fluent"] and not first[2]["is_fluent"]
    assert first[2]["total_bits"] == first[2]["n_bigrams"] * _LM_UNSEEN_BITS

    # the fluent doc's bits match the batch formula by hand:
    # counts over 2 ref docs: each "alpha beta" bigram seen 2*20 times,
    # ctx(alpha) = 40 -> bits = floor(log2(40/40)) = 0 for every seen
    # bigram in-cycle
    assert first[1]["total_bits"] == 0 and first[1]["mille_bits"] == 0

    # batch 2 after restart: only the new file is processed
    pq.write_table(
        pa.Table.from_pylist(_doc_rows([(3, "beta gamma delta alpha")])),
        str(inp / "b2.parquet"),
    )
    run_streaming_perplexity(spark, str(inp), counts_path, out, ckpt)
    final = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(final) == {1, 2, 3}
    assert final[3]["is_fluent"]
    # per-batch subdirectories: idempotent replay sink shape
    batches = {r["batch"] for r in spark.read.parquet(out).select("batch").collect()}
    assert len(batches) == 2


def test_stream_matches_batch_lm_score(spark, tmp_path):
    """Streaming scorer == batch lm_score fed the same counts, row for
    row — including zero-bigram docs."""
    import random

    from coa_ocr_simple_spark.plans.driver_queries_quality import lm_score

    rng = random.Random(5)
    vocab = [f"v{j}" for j in range(25)]
    ref_rows = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(40)))
        for i in range(5)
    ]
    doc_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(15))) for i in range(8)
    ] + [(8, ""), (9, "solo")]

    ref_path = str(tmp_path / "ref2.parquet")
    pq.write_table(pa.Table.from_pylist(_doc_rows(ref_rows)), ref_path)
    counts = lm_train_counts(spark.read.parquet(ref_path))
    counts_path = str(tmp_path / "counts2.parquet")
    counts.write.parquet(counts_path)

    inp = tmp_path / "docs2"
    inp.mkdir()
    pq.write_table(
        pa.Table.from_pylist(_doc_rows(doc_rows)), str(inp / "all.parquet")
    )
    out = str(tmp_path / "scores2")
    run_streaming_perplexity(
        spark, str(inp), counts_path, out, str(tmp_path / "ckpt2")
    )
    streamed = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"], r["mille_bits"],
                      r["is_fluent"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"], r["mille_bits"],
                      r["is_fluent"])
        for r in lm_score(
            spark.read.parquet(str(inp / "all.parquet")),
            spark.read.parquet(counts_path),
        ).collect()
    }
    assert streamed == batch
