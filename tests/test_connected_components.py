"""Scale-hardening guards for the iterative connected-components loop
(round-2 verdict item 4): pointer-jumping convergence on a long chain in
far fewer rounds than the diameter, constant plan depth per round
(localCheckpoint), and a LOUD failure instead of silently-wrong labels
when the round cap is hit."""

from __future__ import annotations

import pytest

from coa_ocr_simple_spark.plans.driver_queries_dedup import (
    ConvergenceError,
    connected_components,
)

CHAIN_LEN = 13  # nodes 0-12 -> diameter 12


def _chain_edges(spark, n=CHAIN_LEN, offset=0):
    rows = [(f"d{offset + i:04d}", f"d{offset + i + 1:04d}") for i in range(n - 1)]
    return spark.createDataFrame(rows, ["doc_a", "doc_b"])


def test_long_chain_converges_sublinearly(spark):
    """A diameter-12 chain must collapse to ONE component labeled by its
    min node — and pointer jumping must get there in well under 12
    rounds (plain min-propagation needs the full diameter)."""
    stats: dict = {}
    out = connected_components(_chain_edges(spark), stats=stats).collect()
    assert len(out) == CHAIN_LEN
    assert {r["cluster_id"] for r in out} == {"d0000"}
    # log2(12) ~ 3.6; allow slack for the +1 convergence-detection round
    assert stats["rounds"] <= 7, stats
    assert stats["rounds"] < CHAIN_LEN - 1, stats


def test_disjoint_components_keep_distinct_min_labels(spark):
    e = _chain_edges(spark, n=5, offset=0).unionByName(
        _chain_edges(spark, n=4, offset=100)
    )
    out = connected_components(e).collect()
    labels = {r["doc_id"]: r["cluster_id"] for r in out}
    assert labels["d0004"] == "d0000"
    assert labels["d0103"] == "d0100"
    assert len(out) == 9


def test_round_cap_raises_instead_of_wrong_labels(spark):
    """ADVICE (round 2): exhausting the cap unconverged must raise — a
    10^12-doc run must fail fast, never emit unconverged cluster ids."""
    with pytest.raises(ConvergenceError):
        connected_components(_chain_edges(spark), max_iters=1)


def test_empty_edge_set(spark):
    e = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(e).count() == 0


def test_nonpositive_max_iters_raises_value_error(spark):
    """ADVICE (round 3): max_iters < 1 previously died on an unbound
    `changed` NameError inside the ConvergenceError message; it must be
    rejected up front instead."""
    with pytest.raises(ValueError, match="max_iters"):
        connected_components(_chain_edges(spark, n=3), max_iters=0)
    with pytest.raises(ValueError, match="max_iters"):
        connected_components(_chain_edges(spark, n=3), max_iters=-2)
