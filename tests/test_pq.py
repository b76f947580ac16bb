"""Product quantization (PQ codes + IVF-PQ ADC search) semantics.

DuckDB value parity is enforced by tests/test_extra_oracles.py (the two
queries are EXTRA registry entries); these pin the PQ-specific
invariants an oracle diff can't explain on its own: codebook shape,
zero-distance self-encoding of the codeword seeds, dense ranks,
ADC monotonicity, and recall above the chance floor."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from coa_ocr_simple_spark.plans.driver_queries_ext import (
    _PQ_K,
    _PQ_M,
    _PQ_SEED_MOD,
    _PQ_SEED_SCAN,
    _pq_codebook,
    _quantize,
    _read,
)

SF = "/root/testdata/sf0.001"


def test_codebook_is_m_by_k(spark):
    emb = _read(spark, SF, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qv")
    )
    cb = _pq_codebook(emb).collect()
    assert len(cb) == _PQ_M * _PQ_K
    per_m = collections.Counter(r["m"] for r in cb)
    assert per_m == {m: _PQ_K for m in range(_PQ_M)}
    # codes are 0.._PQ_K-1 within every subspace
    for m in range(_PQ_M):
        assert sorted(r["code"] for r in cb if r["m"] == m) == list(range(_PQ_K))


def test_pq_codes_shape_and_seed_self_encoding(spark):
    codes = entrymod.extra_queries()["ann_pq_codes"](spark, SF).collect()
    per_vec = collections.Counter(r["vec_id"] for r in codes)
    assert set(per_vec.values()) == {_PQ_M}  # every vector: exactly M rows
    # a codeword seed's subvectors ARE codewords -> distance 0 in all
    # subspaces; nothing else should self-encode exactly on this corpus
    zero_vecs = {
        v
        for v, n in collections.Counter(
            r["vec_id"] for r in codes if r["dist_q"] == 0
        ).items()
        if n == _PQ_M
    }
    seeds = {
        v
        for v in per_vec
        if v % _PQ_SEED_MOD == 1 and v < _PQ_SEED_SCAN
    }
    seeds = set(sorted(seeds)[:_PQ_K])
    assert zero_vecs == seeds
    assert all(r["dist_q"] >= 0 for r in codes)


def test_ivfpq_ranks_dense_and_adc_monotone(spark):
    rows = entrymod.extra_queries()["ann_ivfpq_search"](spark, SF).collect()
    by_q: dict[int, list] = collections.defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    assert by_q  # at least one query produced results
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        adcs = [r["adc_q"] for r in rs]
        assert adcs == sorted(adcs)  # ADC non-decreasing with rank


def test_ivfpq_beats_chance_against_exact_ivf(spark):
    """ADC with untrained (deterministic-seed) codebooks is lossy, but
    must still beat the chance floor: a query's IVF list holds ~100
    candidates at sf0.001, so 5 random picks overlap the exact top-5 by
    ~0.25 pairs/query.  The deterministic measured overlap is 6 of 25
    pairs at M=16/K=16 (recall 0.24, ~5x chance; 5 of 25 at the old
    M=4); assert >= 4 to leave refactor room while still catching a
    broken distance."""
    qs = entrymod.queries()
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in qs["ann_ivf_search"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_search"](spark, SF).collect()
    }
    assert len(ivf & pq) >= 4


def test_lloyd_codebook_recall_strictly_beats_seed_baseline(spark):
    """Round-4 verdict item 5: the exact-integer Lloyd refinement must
    lift IVF-PQ recall STRICTLY above the untrained seed-codebook
    baseline.  Measured on this corpus: seed 6/25 exact-IVF pairs,
    2-step Lloyd 9/25 (sf0.1 sweep: 0.38 -> 0.45 recall@5)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.queries()["ann_ivf_search"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    seed = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_search"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    lloyd = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_search_lloyd"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert len(exact & lloyd) > len(exact & seed)


def test_lloyd_codes_shape_and_distance_units(spark):
    """Lloyd PQ codes keep the ann_pq_codes contract: M rows per vector,
    dense code domain, non-negative distances (in _PQ_LLOYD_Q^2 units)."""
    from coa_ocr_simple_spark.plans.driver_queries_ext import _PQ_K as K

    codes = entrymod.extra_queries()["ann_pq_codes_lloyd"](spark, SF).collect()
    spark.catalog.clearCache()
    per_vec = collections.Counter(r["vec_id"] for r in codes)
    assert set(per_vec.values()) == {_PQ_M}
    assert all(0 <= r["code"] < K for r in codes)
    assert all(r["dist_q"] >= 0 for r in codes)


def test_ivfpq_nprobe_two_recall_at_least_nprobe_one(spark):
    """The nprobe knob composed with ADC: probing two lists must not
    LOSE brute-force-truth recall vs one list (every nprobe=1 candidate
    list is still probed at nprobe=2), and typically regains queries
    that sit just inside the wrong Voronoi cell."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_topk"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    p1 = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_search_lloyd"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    p2 = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_search_lloyd_p2"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert len(truth & p2) >= len(truth & p1)
    # the probe union strictly widens somewhere on this corpus: at
    # least one query returns a different top-k set
    assert p2 != p1


def test_rerank_recall_strictly_beats_adc_only(spark):
    """The exact-dot refine of the ADC shortlist must recover rank
    resolution the lossy codes dropped: against the exact-in-list
    ranking over the SAME candidate pool (ann_ivf_search_p2), the
    reranked top-5 must strictly beat the ADC-only top-5, and it must
    not lose brute-force-truth recall either."""
    exact_in_list = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivf_search_p2"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_topk"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_search_lloyd_p2"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    rr = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_rerank"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    assert len(exact_in_list & rr) > len(exact_in_list & adc)
    assert len(truth & rr) >= len(truth & adc)


def test_trained_coarse_router_recall_strictly_beats_seed_router(spark):
    """The Lloyd-refined coarse quantizer (full-vector exact-integer
    k-means, min-L2 routing) must strictly beat the seed+max-dot router
    against brute-force truth on the otherwise-identical read path
    (lloyd codebook, nprobe=2, exact rerank) — routing was the proven
    remaining recall loss (BENCH/ann_recall_r05.json: rerank == the
    seed router's in-list ceiling).  Measured here: 16 vs 11 of 25."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_topk"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    seed_rr = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_rerank"](spark, SF).collect()
    }
    spark.catalog.clearCache()
    ck_rr = {
        (r["query_id"], r["neighbor_id"])
        for r in entrymod.extra_queries()["ann_ivfpq_rerank_ck"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert len(truth & ck_rr) > len(truth & seed_rr)


def test_kmeans_clusters_partition_and_inertia_shrinks(spark):
    """kmeans_clusters is a true partition of the corpus (member counts
    sum to |N|), and the trained centroids fit their clusters strictly
    better than the untrained seeds under the SAME assignment metric —
    the Lloyd objective actually decreased."""
    from coa_ocr_simple_spark.plans.driver_queries_ext import (
        _IVF_CENTROID_MOD,
        _PQ_LLOYD_Q,
        _ivf_centroids_lloyd,
        _ivf_lloyd_assign,
    )

    rows = entrymod.extra_queries()["kmeans_clusters"](spark, SF).collect()
    spark.catalog.clearCache()
    emb = _read(spark, SF, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qv")
    )
    n_vecs = emb.count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert all(r["mean_d2q"] == r["sum_d2q"] // r["n_members"] for r in rows)
    # seed-centroid inertia under the same min-L2 assignment
    seeds = emb.where(F.col("vec_id") % _IVF_CENTROID_MOD == 1).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("qv", lambda x: x * _PQ_LLOYD_Q).alias("cv"),
    )
    q2 = _PQ_LLOYD_Q * _PQ_LLOYD_Q
    seed_inertia = (
        _ivf_lloyd_assign(emb, seeds)
        .select(F.expr(f"d2 DIV {q2}").alias("d2q"))
        .agg(F.sum("d2q"))
        .collect()[0][0]
    )
    spark.catalog.clearCache()
    trained_inertia = sum(r["sum_d2q"] for r in rows)
    assert trained_inertia < seed_inertia


def test_cluster_quota_guard_bounds_degenerate_clustering(spark):
    """All-identical vectors collapse every assignment onto ONE
    centroid (lowest id wins ties) — the exact degenerate case the
    in-plan md5-prefix guard exists for: the mega cluster must admit
    ~_CL_QUOTA_CAP rows to its ranking window, never its full size,
    and the final sample must equal the unguarded top-K by md5 rank."""
    import hashlib

    from coa_ocr_simple_spark.plans.driver_queries_ext import (
        _CL_QUOTA_CAP,
        _CL_QUOTA_K,
        _cluster_quota_survivors,
        _ivf_centroids_lloyd,
        _ivf_lloyd_assign,
    )

    n = 20_000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(7).cast("long")] * 8).alias("qv"),
    )
    emb = emb.persist()
    emb.count()
    cents = _ivf_centroids_lloyd(emb).persist()
    cents.count()
    assign = _ivf_lloyd_assign(emb, cents).select("vec_id", "centroid_id")
    assign = assign.persist()
    assign.count()
    # degenerate: one cluster owns the corpus
    sizes = {
        r["centroid_id"]: r["n"]
        for r in assign.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert max(sizes.values()) == n and len(sizes) == 1
    counts = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("_cl_n")
    )
    surv = _cluster_quota_survivors(assign, counts)
    n_surv = surv.count()
    assert n_surv <= 4 * _CL_QUOTA_CAP, n_surv  # expected ~240, bound 960

    # the guarded window's sample == the unguarded top-K by md5 rank
    from pyspark.sql import Window

    w = Window.partitionBy("centroid_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    got = sorted(
        r["vec_id"]
        for r in surv.select(
            "vec_id", F.row_number().over(w).alias("r")
        )
        .where(F.col("r") <= _CL_QUOTA_K)
        .collect()
    )
    expected = sorted(
        vid
        for _, vid in sorted(
            (hashlib.md5(str(v).encode()).hexdigest(), v) for v in range(n)
        )[:_CL_QUOTA_K]
    )
    assert got == expected
    emb.unpersist()
    assign.unpersist()
    spark.catalog.clearCache()
