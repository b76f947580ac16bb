"""Streaming interval counting: batch==stream sum-merge exactness,
checkpoint continuation, zero-anchor rows, width validation."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from coa_ocr_simple_spark.plans.driver_queries_ext import _IVAL_BUCKET_US

EPOCH = dt.datetime(2024, 1, 1)
H = _IVAL_BUCKET_US // 2


def _events_df(spark, rows):
    data = [
        (eid, EPOCH + dt.timedelta(microseconds=off), float(v))
        for eid, off, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, value double"
    )


_PA_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),  # pandas would write NANOS, which
        ("value", pa.float64()),  # Spark's parquet reader rejects
    ]
)


def _write_events(rows, path):
    data = [
        {
            "event_id": eid,
            "ts": EPOCH + dt.timedelta(microseconds=off),
            "value": float(v),
        }
        for eid, off, v in rows
    ]
    papq.write_table(pa.Table.from_pylist(data, schema=_PA_SCHEMA), path)


def _anchors_df(spark, centers_us):
    return spark.createDataFrame(
        [(i, c - H, c + H) for i, c in enumerate(centers_us)],
        "anchor_id long, lo long, hi long",
    )


def test_stream_equals_batch_across_restart(spark, tmp_path):
    from coa_ocr_simple_spark.streaming.interval_stream import (
        compact_interval_state,
        interval_batch_counts,
        interval_counts_state,
        run_streaming_interval_counts,
    )

    day = 86_400_000_000
    anchors = _anchors_df(spark, [5 * day, 20 * day, 30 * day])
    apath = str(tmp_path / "anchors")
    anchors.write.parquet(apath)

    rows1 = [(i, 5 * day + (i - 10) * (H // 16), 1.5) for i in range(20)]
    rows2 = [(100 + i, 30 * day + i * (H // 4), 2.0) for i in range(10)]
    inp = tmp_path / "events"
    inp.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_events(rows1, str(inp / "a.parquet"))
    run_streaming_interval_counts(spark, str(inp), apath, state, ckpt)
    got1 = {
        r["anchor_id"]: (r["n_events"], r["sum_value_mille"])
        for r in interval_counts_state(spark, state, anchors).collect()
    }
    ref1 = {
        r["anchor_id"]: (r["n_events"], r["sum_value_mille"])
        for r in interval_batch_counts(
            _events_df(spark, rows1), anchors
        ).collect()
    }
    assert got1[1] == (0, 0)  # anchor with no events still reported
    for a, v in ref1.items():
        assert got1[a] == v

    # restart with a second file: totals == one batch pass on the union
    _write_events(rows2, str(inp / "b.parquet"))
    run_streaming_interval_counts(spark, str(inp), apath, state, ckpt)
    got = {
        r["anchor_id"]: (r["n_events"], r["sum_value_mille"])
        for r in interval_counts_state(spark, state, anchors).collect()
    }
    union = _events_df(spark, rows1).unionByName(_events_df(spark, rows2))
    ref = {
        r["anchor_id"]: (r["n_events"], r["sum_value_mille"])
        for r in interval_batch_counts(union, anchors).collect()
    }
    assert got == {**{0: (0, 0), 1: (0, 0), 2: (0, 0)}, **ref}

    compact_interval_state(spark, state)
    after = {
        r["anchor_id"]: (r["n_events"], r["sum_value_mille"])
        for r in interval_counts_state(spark, state, anchors).collect()
    }
    assert after == got
    spark.catalog.clearCache()


def test_too_wide_anchor_is_rejected(spark, tmp_path):
    from coa_ocr_simple_spark.streaming.interval_stream import (
        run_streaming_interval_counts,
    )

    bad = spark.createDataFrame(
        [(0, 0, _IVAL_BUCKET_US + 1)], "anchor_id long, lo long, hi long"
    )
    apath = str(tmp_path / "anchors")
    bad.write.parquet(apath)
    inp = tmp_path / "events"
    inp.mkdir()
    _write_events([(0, 0, 1.0)], str(inp / "a.parquet"))
    with pytest.raises(ValueError, match="wider than the bucket"):
        run_streaming_interval_counts(
            spark,
            str(inp),
            apath,
            str(tmp_path / "state"),
            str(tmp_path / "ckpt"),
        )
