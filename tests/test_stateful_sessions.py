"""applyInPandasWithState session assembly == batch sessionization for
every CLOSED session (each user's final session stays open in state)."""

from __future__ import annotations

import os
import shutil

from coa_ocr_simple_spark.streaming.stateful_sessions import run_stateful_sessions


def test_stateful_sessions_match_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/events.parquet")

    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    run_stateful_sessions(spark, src, out, ckpt)

    emitted = spark.read.parquet(out)
    assert emitted.count() > 0

    # batch ground truth: the same gap rule via the window-function query
    from coa_ocr_simple_spark.plans.driver_queries_ext import q_sessionize_events

    batch = q_sessionize_events(spark, "/root/testdata/sf0.001")
    batch_rows = {
        (r["user_id"], r["session_seq"]): r for r in batch.collect()
    }

    last_seq = {}
    for (user, seq), _ in batch_rows.items():
        last_seq[user] = max(last_seq.get(user, 0), seq)

    for r in emitted.collect():
        # stream session_seq is 0-based; batch cumulative-sum seq is 1-based
        expected = batch_rows[(r["user_id"], r["session_seq"] + 1)]
        assert r["n_events"] == expected["n_events"], r
        assert r["value_sum_m"] == expected["value_sum_m"], r
        # the final (still-open) session of each user is never emitted
        assert r["session_seq"] + 1 < last_seq[r["user_id"]] + 1

    # completeness: every non-final batch session was emitted
    n_expected_closed = sum(seq - 1 for seq in last_seq.values())
    assert emitted.count() == n_expected_closed
