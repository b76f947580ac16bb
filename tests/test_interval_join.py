"""interval_event_counts: the bucketized point-in-interval join.

DuckDB value parity comes from the extras gate (the oracle is a naive
BETWEEN join — stating the semantics the bucket trick must reproduce);
what these tests pin is the part an oracle diff can't see: the PLAN
never degrades to a nested-loop/cartesian join (the exact trap the
bucketization exists to avoid), and the boundary/empty-window/bucket-
crossing semantics on a hand-built corpus."""

from __future__ import annotations

import datetime as dt

from coa_ocr_simple_spark.plans.driver_queries_ext import (
    _IVAL_HALF_US,
    interval_event_counts,
)

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, offset_us, value)"""
    data = [
        (eid, EPOCH + dt.timedelta(microseconds=off), float(v))
        for eid, off, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, value double"
    )


def test_no_nested_loop_join_in_plan(spark):
    df = interval_event_counts(
        _events(spark, [(i, i * 1_000_000, 1.0) for i in range(20)])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_boundaries_empty_windows_and_bucket_crossing(spark):
    h = _IVAL_HALF_US
    day = 86_400_000_000
    rows = [
        # anchor 0 (top value) sits at t=0; neighbors exactly AT the
        # +/-30min boundary (included) and 1 us outside (excluded)
        (0, 5 * day, 100.0),
        (1, 5 * day - h, 1.0),        # exactly lo -> in
        (2, 5 * day + h, 1.0),        # exactly hi -> in
        (3, 5 * day - h - 1, 1.0),    # 1 us early -> out
        (4, 5 * day + h + 1, 1.0),    # 1 us late -> out
        # anchor 5: alone in its own week -> zero-count row must appear
        (5, 20 * day, 90.0),
        # anchor 6: its window straddles a bucket boundary; the
        # neighbor lands in the OTHER bucket than the anchor's center
        (6, 30 * day + h // 2, 80.0),
        (7, 30 * day + h // 2 + h - 1000, 2.0),
    ]
    got = {
        r["anchor_id"]: (r["n_events"], r["sum_value_mille"])
        for r in interval_event_counts(_events(spark, rows)).collect()
    }
    spark.catalog.clearCache()
    # top-8 by value: every event is an anchor here (8 rows)
    assert len(got) == 8
    assert got[0] == (2, 2000)        # ids 1 and 2 only
    assert got[5] == (0, 0)           # empty window still reported
    assert got[6][0] == 1 and got[6][1] == 2000  # cross-bucket neighbor found
    # anchor 1's own window [5d-2h, 5d] contains the big event (at its
    # hi boundary) and event 3 (1 us inside its lo side)
    assert got[1] == (2, 101000)
    # anchor 3's window [5d-2h-1, 5d-1] contains only event 1
    assert got[3] == (1, 1000)
