"""Watermarked windowed streaming aggregation == batch ground truth for
every emitted (finalized) window."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from coa_ocr_simple_spark.streaming.windowed_metrics import run_windowed_event_counts


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    import os

    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/events.parquet")

    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    run_windowed_event_counts(spark, src, out, ckpt)

    emitted = spark.read.parquet(out)
    n_emitted = emitted.count()
    assert n_emitted > 0  # some windows are past the watermark and finalized

    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("value_sum_m"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum_m",
            "approx_users",
        )
    )
    key = lambda r: (r["window_start"], r["event_type"])
    batch_rows = {key(r): r for r in batch.collect()}
    for r in emitted.collect():
        expected = batch_rows[key(r)]
        assert r["n_events"] == expected["n_events"]
        assert r["value_sum_m"] == expected["value_sum_m"]
        assert r["approx_users"] == expected["approx_users"]

    # windows still inside the watermark horizon are withheld (append mode)
    max_end = max(r["window_end"] for r in batch_rows.values())
    emitted_ends = {r["window_end"] for r in emitted.collect()}
    assert max_end not in emitted_ends
