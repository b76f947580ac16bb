"""Encoding-artifact scan branch liveness.

DuckDB value parity (counts + scrubbed md5) is enforced by the extra
oracle gate; this pins that the synthesized corpus actually exercises
every injection branch — each doc_id % 6 variant yields exactly its own
artifact class and nothing else, and scrubbing restores cleanliness.
"""

from __future__ import annotations

import collections

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_every_injection_branch_is_live_and_pure(spark):
    rows = entrymod.extra_queries()["encoding_artifacts"](spark, SF).collect()
    spark.catalog.clearCache()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in rows:
        a = agg[r["doc_id"] % 6]
        a[0] += r["n_moji"]
        a[1] += r["n_repl"]
        a[2] += r["n_ctl"]
        a[3] += r["is_clean"]
        a[4] += 1
    assert sorted(agg) == list(range(6))
    for v, (moji, repl, ctl, clean, n) in agg.items():
        if v in (0, 5):  # untouched
            assert (moji, repl, ctl) == (0, 0, 0) and clean == n
        else:
            assert clean == 0
    # each dirty variant produces its own class (variant 4 all three)
    assert agg[1][0] > 0 and agg[1][1] == 0 and agg[1][2] == 0
    assert agg[2][1] > 0 and agg[2][0] == 0 and agg[2][2] == 0
    assert agg[3][2] > 0 and agg[3][0] == 0 and agg[3][1] == 0
    assert agg[4][0] > 0 and agg[4][1] > 0 and agg[4][2] > 0
    # per-doc injected counts follow the doc_id arithmetic exactly
    for r in rows:
        v = r["doc_id"] % 6
        if v == 1:
            assert r["n_moji"] == 1 + (r["doc_id"] % 3 + 1)
        elif v == 2:
            assert r["n_repl"] == r["doc_id"] % 4 + 1
        elif v == 3:
            assert r["n_ctl"] == 2 * (r["doc_id"] % 2 + 1) + 1
        elif v == 4:
            assert (r["n_moji"], r["n_repl"], r["n_ctl"]) == (1, 1, 1)
