"""The core invariant (FIXTURES.md §5, SURVEY.md §5.2.2): the distributed
pipeline's output equals the single-node oracle per document —

- out_spans as ordered sequences of (kind, text, media_ref, offset), and
- doc_type / confidence / entities / code lists / test_results / sections.

The oracle is a sequential run of coa_ocr_simple_spark.core; the pipeline
runs the same functions inside pandas UDFs — so this test verifies the
Spark plumbing: explode order recovery, skew-spread repartition, media
join, groupBy reassembly, Arrow struct marshalling.
"""

from __future__ import annotations

import pytest

from coa_ocr_simple_spark.core import EMPTY_CONFIG, extract_document
from coa_ocr_simple_spark.core.convert import result_to_row
from coa_ocr_simple_spark.plans.extract_plan import ExtractOptions, build_extract_plan


def _oracle_rows(corpus) -> dict[str, dict]:
    rows = {}
    for doc in corpus["builder"].docs:
        oracle = extract_document(
            doc["doc_id"], doc["spans"], corpus["lookup"], EMPTY_CONFIG
        )
        row = result_to_row(oracle)
        row["out_spans"] = oracle["out_spans"]
        rows[doc["doc_id"]] = row
    return rows


@pytest.fixture(scope="module", params=["fused", "staged"])
def pipeline_rows(request, spark, parity_corpus):
    docs = spark.read.parquet(parity_corpus["docs_path"])
    media = spark.read.parquet(parity_corpus["media_path"])
    result = build_extract_plan(
        docs,
        media,
        options=ExtractOptions(
            spread_partitions=16, run_id="parity", fused=request.param == "fused"
        ),
    )
    return {r["doc_id"]: r.asDict(recursive=True) for r in result.collect()}


def test_every_document_extracted_exactly_once(spark, parity_corpus, pipeline_rows):
    expected_ids = {d["doc_id"] for d in parity_corpus["builder"].docs}
    assert set(pipeline_rows) == expected_ids


def test_span_sequence_equality(parity_corpus, pipeline_rows):
    """Per-row invariant vs the oracle: (kind, text, media_ref, order)."""
    oracle = _oracle_rows(parity_corpus)
    for doc_id, expected in oracle.items():
        actual = pipeline_rows[doc_id]["out_spans"]
        expected_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in expected["out_spans"]
        ]
        actual_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in actual
        ]
        assert actual_spans == expected_spans, doc_id


def test_extraction_result_equality(parity_corpus, pipeline_rows):
    oracle = _oracle_rows(parity_corpus)
    for doc_id, expected in oracle.items():
        actual = pipeline_rows[doc_id]
        assert actual["doc_type"] == expected["doc_type"], doc_id
        assert actual["confidence"] == pytest.approx(expected["confidence"]), doc_id
        assert actual["entities"] == expected["entities"], doc_id
        assert actual["hazard_codes"] == expected["hazard_codes"], doc_id
        assert actual["cas_numbers"] == expected["cas_numbers"], doc_id
        assert actual["test_results"] == expected["test_results"], doc_id
        assert actual["sections"] == expected["sections"], doc_id
        assert actual["fingerprint"] == expected["fingerprint"], doc_id


def test_lineage_columns_present(pipeline_rows):
    for row in pipeline_rows.values():
        assert row["_run_id"] == "parity"
        assert isinstance(row["_partition_id"], int)
