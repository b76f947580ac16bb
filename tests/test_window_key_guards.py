"""Per-key window guards: every unbounded-per-key sort in the registry
is bounded IN THE PLAN (the source_quota_sample treatment, extended in
round 4 to the event windows and the IVF probe join):

- sessionize_events / asof_last_view: users above _MAX_USER_EVENTS are
  excluded (a bot key would serialize a 10^12-event run onto one task);
- ann_ivf_search: inverted lists above _MAX_IVF_LIST are excluded from
  the probe join (a degenerate quantizer cell is a single-task
  near-brute-force scan).

Plus the recall evidence for the nprobe knob itself.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import coa_ocr_simple_spark.plans.driver_queries_ext as ext

SF = "/root/testdata/sf0.001"


def _events(spark, per_user: dict[str, int]):
    rows = []
    eid = 0
    for user, n in per_user.items():
        for i in range(n):
            rows.append(
                {
                    "event_id": eid,
                    "user_id": user,
                    "event_type": "view" if i % 2 else "click",
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_bounded_users_drops_only_mega_users(spark, monkeypatch):
    monkeypatch.setattr(ext, "_MAX_USER_EVENTS", 10)
    ev = _events(spark, {"bot": 12, "human_a": 5, "human_b": 10})
    out = ext._bounded_users(ev)
    per = {r["user_id"]: r["count"] for r in out.groupBy("user_id").count().collect()}
    assert per == {"human_a": 5, "human_b": 10}  # cap is inclusive; bot gone


def test_sessionize_plan_filters_before_window(spark):
    """The guard must sit below the Window in the committed plan (plans
    print top-down: Window line precedes the semi-join/filter lines)."""
    df = ext.q_sessionize_events(spark, SF)
    s = df._jdf.queryExecution().executedPlan().toString()
    lines = s.splitlines()
    win = [i for i, l in enumerate(lines) if "windowspecdefinition(" in l]
    guard = [
        i
        for i, l in enumerate(lines)
        if ("LeftSemi" in l or str(ext._MAX_USER_EVENTS) in l)
    ]
    assert win and guard, s
    assert min(win) < min(guard), s


def test_asof_guard_shares_the_same_cap(spark, monkeypatch):
    """asof_last_view applies the identical user guard: with a tiny cap
    a mega-user's clicks disappear from the output."""
    import coa_ocr_simple_spark.plans.driver_queries_corpus as corpus

    monkeypatch.setattr(ext, "_MAX_USER_EVENTS", 10)
    # the oracle string is baked at import; the Spark plan reads the
    # constant at build time — this test only exercises the Spark side
    ev = _events(spark, {"bot": 12, "human_a": 6})
    # route the plan through a temp view of our synthetic frame
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = corpus.q_asof_last_view(spark, d).collect()
    users = {r["user_id"] for r in out}
    assert users == {"human_a"}


def test_ivf_hot_list_cap_is_live_in_plan(spark, monkeypatch):
    """cap=0 must exclude every list — proving the gate executes — while
    the default cap leaves results identical to the oracle (checked by
    the standing oracle gate)."""
    monkeypatch.setattr(ext, "_MAX_IVF_LIST", 0)
    assert ext.q_ann_ivf_search(spark, SF).count() == 0


def test_nprobe_two_recall_at_least_nprobe_one(spark):
    """The recall knob must actually buy recall: vs the brute-force
    top-5, nprobe=2 recovers at least as many true neighbors as
    nprobe=1 (and both find a nonzero share)."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ext.q_ann_topk(spark, SF).collect()
    }
    r1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ext._ivf_search(spark, SF, nprobe=1).collect()
    }
    r2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ext._ivf_search(spark, SF, nprobe=2).collect()
    }
    rec1 = len(truth & r1) / len(truth)
    rec2 = len(truth & r2) / len(truth)
    assert rec2 >= rec1
    assert rec2 > 0


def test_hot_gram_cap_is_live(spark, monkeypatch):
    """gram_decontamination's eval x train join is bounded per gram key:
    with cap=0 every train gram is excluded and no overlap survives;
    with the default cap the sf0.001 result is untouched (oracle gate)."""
    import coa_ocr_simple_spark.plans.driver_queries_quality as q

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    monkeypatch.setattr(q, "_MAX_GRAM_TRAIN_DOCS", 0)
    assert q.gram_decontamination(docs).count() == 0
