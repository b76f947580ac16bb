"""End-to-end multimodal retrieval composition: opaque binary assets ->
embed_binary feature extraction -> persisted IVF-PQ index -> refined
search.  The planted byte-identical twin must be retrievable: identical
payloads embed identically, route identically, survive ADC, and win the
exact re-rank.  This is the pipeline a production system runs (media
dedup via vector index) composed ONLY from shipped pieces."""

from __future__ import annotations

from pyspark.sql import functions as F

from coa_ocr_simple_spark.operators.multimodal_binary import (
    embed_binary,
    synth_payload,
)
from coa_ocr_simple_spark.plans.ann_index import (
    build_index_frames,
    search_index_frames,
)
from coa_ocr_simple_spark.plans.driver_queries_ext import _quantize

N_ASSETS = 500  # >= 467 so the PQ seed scan finds its 16 codewords
TWIN_QUERY = 200  # a query id (divisible by 100)
TWIN_SOURCE = 137  # the asset whose bytes the query duplicates


def test_binary_assets_are_retrievable_through_the_index(spark):
    rows = []
    for i in range(N_ASSETS):
        seed = f"a-{TWIN_SOURCE}" if i == TWIN_QUERY else f"a-{i}"
        rows.append((f"a-{i:04d}", "image", synth_payload(seed, 2048)))
    assets = spark.createDataFrame(
        rows, "asset_id string, kind string, payload binary"
    )
    emb = embed_binary(assets, dim=64).select(
        F.substring("asset_id", 3, 4).cast("long").alias("vec_id"),
        "embedding",
    )
    vecs = emb.select(
        "vec_id", _quantize(F.col("embedding")).alias("qv")
    ).persist()
    vecs.count()

    centroids, codebook, codes = build_index_frames(vecs)
    queries = vecs.where(F.col("vec_id") % 100 == 0)
    hits = search_index_frames(
        queries,
        centroids,
        codebook,
        codes,
        nprobe=2,
        rerank=32,
        vectors=vecs,
        exclude_self=True,
    ).collect()
    spark.catalog.clearCache()

    by_q = {}
    for r in hits:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 100, 200, 300, 400}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(r["neighbor_id"] != q for r in rs)  # exclude_self
    # the byte-twin wins the refined search for its duplicate query
    assert by_q[TWIN_QUERY][0]["neighbor_id"] == TWIN_SOURCE
    vecs.unpersist()
