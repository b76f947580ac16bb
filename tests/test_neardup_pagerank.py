"""neardup_pagerank: independent Python power-iteration agreement.

The DuckDB oracle re-runs the same unrolled SQL; this test instead
re-implements the integer PageRank independently (plain dicts, the
same truncating-division recipe) over the ALREADY-ORACLE-CHECKED
candidate pairs, and requires exact rank_ppm agreement — so a mistake
in the Spark loop's join/checkpoint plumbing can't hide behind a
mirrored oracle mistake.
"""

from __future__ import annotations

import collections

import __spark_entry__ as entrymod
from coa_ocr_simple_spark.plans.driver_queries_dedup import (
    _MIN_BANDS_AGREE,
    _PR_BASE_PPM,
    _PR_DAMP_MILLE,
    _PR_ITERS,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_independent_reference(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in entrymod.extra_queries()["minhash_candidate_pairs"](
            spark, SF
        ).collect()
        if r["n_bands_agree"] >= _MIN_BANDS_AGREE
    ]
    spark.catalog.clearCache()
    assert pairs  # the corpus must exercise the operator

    adj = collections.defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    ranks = {v: 1_000_000 for v in adj}
    for _ in range(_PR_ITERS):
        sums = collections.defaultdict(int)
        for u, ns in adj.items():
            c = (ranks[u] * _PR_DAMP_MILLE) // (1000 * deg[u])
            for v in ns:
                sums[v] += c
        ranks = {v: _PR_BASE_PPM + sums.get(v, 0) for v in adj}

    got = {
        r["doc_id"]: (r["degree"], r["rank_ppm"])
        for r in entrymod.extra_queries()["neardup_pagerank"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert set(got) == set(adj)
    for v in adj:
        assert got[v] == (deg[v], ranks[v]), v
    # centrality does its job somewhere: ranks are not all equal
    assert len({r for _, r in got.values()}) > 1


def test_triangles_match_independent_reference(spark):
    """neardup_triangles: independent set-based triangle count +
    integer clustering coefficient over the oracle-checked pairs must
    agree exactly with the join-based Spark plan."""
    from coa_ocr_simple_spark.plans.driver_queries_dedup import (
        _MIN_BANDS_AGREE as M,
    )

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in entrymod.extra_queries()["minhash_candidate_pairs"](
            spark, SF
        ).collect()
        if r["n_bands_agree"] >= M
    }
    spark.catalog.clearCache()
    assert pairs
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    # count each triangle once via the canonical a < b < c enumeration
    tri = collections.Counter()
    for a, b in pairs:
        common = adj[a] & adj[b]
        for c in common:
            if b < c and (b, c) in pairs and a < b:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1

    got = {
        r["doc_id"]: (r["degree"], r["n_triangles"], r["clustering_mille"])
        for r in entrymod.extra_queries()["neardup_triangles"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert set(got) == set(adj)
    for v in adj:
        deg = len(adj[v])
        t = tri.get(v, 0)
        cm = 0 if deg < 2 else (2 * t * 1000) // (deg * (deg - 1))
        assert got[v] == (deg, t, cm), v
    # the corpus must actually exercise closure: some triangles exist
    assert any(t > 0 for t in tri.values())


def test_lsh_calibration_rolls_up_the_candidate_set(spark):
    """lsh_calibration: levels partition the full candidate set (pair
    counts sum to the generator's total), stats are internally
    consistent, and the table justifies the configured gate — the
    near-dup precision at the top agreement level far exceeds the
    bottom level's."""
    from coa_ocr_simple_spark.plans.driver_queries_dedup import (
        lsh_calibration,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = sorted(
        lsh_calibration(docs).collect(), key=lambda r: r["n_bands_agree"]
    )
    spark.catalog.clearCache()
    n_cands = (
        entrymod.extra_queries()["minhash_candidate_pairs"](spark, SF).count()
    )
    spark.catalog.clearCache()
    assert sum(r["n_pairs"] for r in rows) == n_cands
    from coa_ocr_simple_spark.plans.driver_queries_dedup import (
        _CAL_EXACT_LEVEL,
    )

    for r in rows:
        assert 1 <= r["n_bands_agree"] <= 8
        # levels at/above the exact threshold score every pair; sampled
        # levels score a non-empty strict subset on this corpus
        if r["n_bands_agree"] >= _CAL_EXACT_LEVEL:
            assert r["n_scored"] == r["n_pairs"]
        else:
            assert 0 < r["n_scored"] < r["n_pairs"]
        assert (
            r["min_jaccard_pct"]
            <= r["mean_jaccard_pct"]
            <= r["max_jaccard_pct"]
        )
        assert 0 <= r["neardup_precision_pct"] <= 100
    assert (
        rows[-1]["neardup_precision_pct"] > rows[0]["neardup_precision_pct"]
    )
