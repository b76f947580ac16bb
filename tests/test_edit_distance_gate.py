"""edit_distance_pairs length gate (round-3 verdict item 4): a 1 MB
near-dup candidate pair must complete in bounded time with NULL scores
(the O(L^2) DP would cost ~10^12 cell updates), while short pairs keep
their exact integer distance."""

from __future__ import annotations

import time

import pandas as pd

import coa_ocr_simple_spark.plans.driver_queries_quality as q


def _docs_df(spark, rows):
    pdf = pd.DataFrame(
        [{"doc_id": i, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
         for i, t in rows]
    )
    return spark.createDataFrame(pdf)


def test_megadoc_pair_gated_short_pair_scored(spark):
    big = " ".join(f"w{i % 1000}" for i in range(220_000))  # ~1.3 MB
    assert len(big) > 5 * q._EDIT_MAX_LEN
    small = "alpha beta gamma delta epsilon zeta eta theta " * 40
    rows = [
        (1, big),
        (2, big[:-30] + " changed tail here"),  # near-dup of 1, oversize
        (3, small),
        (4, small[:-6] + "IOTA!"),  # near-dup of 3, within the cap
    ]
    t0 = time.time()
    out = {
        (r["doc_a"], r["doc_b"]): (r["lev"], r["lev_pct"])
        for r in q.edit_distance_pairs(_docs_df(spark, rows)).collect()
    }
    elapsed = time.time() - t0
    # without the gate the 1 MB pair alone is ~10^12 DP cells (hours)
    assert elapsed < 120, elapsed

    assert (1, 2) in out, out  # still a candidate row...
    assert out[(1, 2)] == (None, None)  # ...but ungated scoring is refused
    assert (3, 4) in out, out
    lev, pct = out[(3, 4)]
    assert lev is not None and 1 <= lev <= 30
    assert pct is not None and pct >= 0
