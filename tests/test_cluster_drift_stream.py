"""Streaming cluster drift monitor: batch==stream exactness against the
persisted index's centroids, zero-cluster rows, metric consistency for
both index kinds."""

from __future__ import annotations

from pyspark.sql import functions as F

from coa_ocr_simple_spark.jobs.ann_index import parse_args, run_build

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"


def _state_rows(spark, state, cents):
    from coa_ocr_simple_spark.streaming.cluster_drift_stream import (
        cluster_drift_state,
    )

    return {
        r["centroid_id"]: (r["n_vectors"], r["sum_d2q"], r["mean_d2q"])
        for r in cluster_drift_state(spark, state, cents).collect()
    }


def test_drift_stream_equals_batch_on_trained_index(spark, tmp_path):
    from coa_ocr_simple_spark.streaming.cluster_drift_stream import (
        cluster_batch_stats,
        compact_drift_state,
        load_monitor_centroids,
        run_streaming_cluster_drift,
    )
    from coa_ocr_simple_spark.plans.ann_index import quantized

    index = str(tmp_path / "index")
    run_build(
        parse_args(
            ["build", "--embeddings", EMB, "--index", index, "--coarse-lloyd"]
        ),
        spark,
    )
    cents = load_monitor_centroids(spark, index).persist()
    cents.count()

    emb = spark.read.parquet(EMB)
    inp = tmp_path / "feed"
    inp.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # split the corpus into two arrival files via Spark (timestampless
    # schema, so pandas round-trip is safe here)
    emb.where(F.col("vec_id") % 2 == 0).toPandas().to_parquet(
        str(inp / "a.parquet")
    )
    run_streaming_cluster_drift(spark, str(inp), index, state, ckpt)
    got_half = _state_rows(spark, state, cents)

    emb.where(F.col("vec_id") % 2 == 1).toPandas().to_parquet(
        str(inp / "b.parquet")
    )
    run_streaming_cluster_drift(spark, str(inp), index, state, ckpt)
    got = _state_rows(spark, state, cents)

    ref = {
        r["centroid_id"]: (r["n_vectors"], r["sum_d2q"])
        for r in cluster_batch_stats(quantized(emb), cents).collect()
    }
    # every centroid reported; totals equal one batch pass on the union
    assert set(got) == {
        r["centroid_id"] for r in cents.select("centroid_id").collect()
    }
    for cid, (n, s, m) in got.items():
        rn, rs = ref.get(cid, (0, 0))
        assert (n, s) == (rn, rs)
        assert m == (s // n if n else 0)
    # the half-corpus state was a strict prefix (counts only grew)
    assert all(got_half[c][0] <= got[c][0] for c in got_half)

    compact_drift_state(spark, state)
    assert _state_rows(spark, state, cents) == got
    cents.unpersist()
    spark.catalog.clearCache()


def test_seed_index_centroids_are_q_scaled_on_load(spark, tmp_path):
    from coa_ocr_simple_spark.plans.driver_queries_ext import _PQ_LLOYD_Q
    from coa_ocr_simple_spark.streaming.cluster_drift_stream import (
        load_monitor_centroids,
    )

    index = str(tmp_path / "index_seed")
    run_build(
        parse_args(["build", "--embeddings", EMB, "--index", index]), spark
    )
    raw = {
        r["centroid_id"]: r["cv"]
        for r in spark.read.parquet(f"{index}/centroids").collect()
    }
    scaled = {
        r["centroid_id"]: r["cv"]
        for r in load_monitor_centroids(spark, index).collect()
    }
    assert set(raw) == set(scaled)
    any_id = next(iter(raw))
    assert scaled[any_id] == [x * _PQ_LLOYD_Q for x in raw[any_id]]
    spark.catalog.clearCache()
