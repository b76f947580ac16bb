"""event_transitions: independent Python reference agreement (per-user
(ts, event_id)-ordered adjacent pairs, counted with plain dicts) and
the conservation law n_total_transitions = n_events - n_users."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_transitions_match_independent_reference(spark):
    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )
    rows = list(
        zip(
            tbl.column("user_id").to_pylist(),
            tbl.column("ts").to_pylist(),
            tbl.column("event_id").to_pylist(),
            tbl.column("event_type").to_pylist(),
        )
    )
    by_user = collections.defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((ts, eid, et))
    counts = collections.Counter()
    users = collections.defaultdict(set)
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
            users[(a, b)].add(u)

    got = {
        (r["event_a"], r["event_b"]): (r["n_transitions"], r["n_users"])
        for r in entrymod.extra_queries()["event_transitions"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert got == {
        k: (counts[k], len(users[k])) for k in counts
    }
    # conservation: each user's stream of k events yields k-1 transitions
    n_events = len(rows)
    n_users = len(by_user)
    assert sum(v for v, _ in got.values()) == n_events - n_users
