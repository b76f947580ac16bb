"""event_gap_histogram: independent Python reference agreement (per-user
sorted adjacent gaps, floor-log2 bucketed with int.bit_length) plus the
structural invariants — cum_mille is monotone and ends at exactly 1000,
and total gap count obeys the same k-events -> k-1-gaps conservation law
as event_transitions."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_gap_histogram_matches_independent_reference(spark):
    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    rows = list(
        zip(
            tbl.column("user_id").to_pylist(),
            tbl.column("ts").to_pylist(),
            tbl.column("event_id").to_pylist(),
        )
    )
    by_user = collections.defaultdict(list)
    for u, ts, eid in rows:
        by_user[u].append((ts, eid))
    buckets = collections.Counter()
    users = collections.defaultdict(set)
    lo: dict[int, int] = {}
    hi: dict[int, int] = {}
    for u, evs in by_user.items():
        evs.sort()
        for (t0, _), (t1, _) in zip(evs, evs[1:]):
            d = t1 - t0  # tz-free; timedelta floors into (days, seconds)
            gap = d.days * 86400 + d.seconds
            b = (gap + 1).bit_length() - 1  # floor(log2(gap+1)), exact
            buckets[b] += 1
            users[b].add(u)
            lo[b] = min(lo.get(b, gap), gap)
            hi[b] = max(hi.get(b, gap), gap)

    out = sorted(
        entrymod.extra_queries()["event_gap_histogram"](spark, SF).collect(),
        key=lambda r: r["gap_bucket"],
    )
    spark.catalog.clearCache()
    got = {
        r["gap_bucket"]: (r["n_gaps"], r["n_users"], r["min_gap_s"], r["max_gap_s"])
        for r in out
    }
    assert got == {
        b: (buckets[b], len(users[b]), lo[b], hi[b]) for b in buckets
    }
    # cum_mille: monotone non-decreasing in bucket order, exact integer
    # per-mille of the running total, final row exactly 1000
    total = sum(buckets.values())
    running = 0
    prev = -1
    for r in out:
        running += r["n_gaps"]
        assert r["cum_mille"] == running * 1000 // total
        assert r["cum_mille"] >= prev
        prev = r["cum_mille"]
    assert out[-1]["cum_mille"] == 1000
    # conservation: k events per user -> k-1 gaps
    assert total == len(rows) - len(by_user)
