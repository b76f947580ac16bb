"""corpus_delta: status partition law on the synthesized snapshots and
hash-only join evidence (document bytes never cross the diff join)."""

from __future__ import annotations


def test_status_partition_matches_modulus_law(spark):
    from coa_ocr_simple_spark.plans.driver_queries_mix import (
        _DELTA_A_DROP,
        _DELTA_B_DROP,
        _DELTA_B_EDIT,
        _delta_snapshots,
        corpus_delta,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    out = {
        r["doc_id"]: r["status"]
        for r in corpus_delta(*_delta_snapshots(docs)).collect()
    }

    expected = {}
    for i in ids:
        in_a = i % _DELTA_A_DROP != 0
        in_b = i % _DELTA_B_DROP != 0
        if in_b and not in_a:
            expected[i] = "added"
        elif in_a and not in_b:
            expected[i] = "removed"
        elif in_a and in_b and i % _DELTA_B_EDIT == 0:
            expected[i] = "changed"
    assert out == expected
    assert set(expected.values()) == {"added", "removed", "changed"}


def test_join_carries_hashes_not_text(spark):
    """The diff join must move (doc_id, md5) only: at 100 TB the text
    column crossing the shuffle is the difference between a hash diff
    and re-shipping the corpus."""
    from coa_ocr_simple_spark.plans.driver_queries_mix import (
        _delta_snapshots,
        corpus_delta,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = corpus_delta(*_delta_snapshots(docs))._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
