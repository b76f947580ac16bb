"""source_quota_sample mega-source guard (round-3 verdict item 2): the
hash-prefix pre-filter must be IN the committed plan, bound the biggest
window partition, and leave the sampled result exactly what the
unguarded window would have produced."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

import coa_ocr_simple_spark.plans.driver_queries_quality as q

MEGA_N = 40_000  # one source owning ~97% of the corpus
SMALL_SOURCES = 5
SMALL_N = 200


def _skewed_docs(spark):
    rows = [{"doc_id": i, "source": "mega"} for i in range(MEGA_N)]
    nid = MEGA_N
    for s in range(SMALL_SOURCES):
        for _ in range(SMALL_N):
            rows.append({"doc_id": nid, "source": f"s{s}"})
            nid += 1
    pdf = pd.DataFrame(rows)
    pdf["text"] = "x"
    pdf["lang"] = "en"
    pdf["n_chars"] = 1
    return spark.createDataFrame(pdf)


def _expected_sample(rows):
    by_src: dict[str, list] = {}
    for doc_id, source in rows:
        key = (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id)
        by_src.setdefault(source, []).append((key, doc_id))
    out = set()
    for source, items in by_src.items():
        items.sort()
        for rank, (_, doc_id) in enumerate(items[: q._QUOTA_K], start=1):
            out.add((doc_id, source, rank))
    return out


def test_mega_source_sample_is_exact_and_bounded(spark):
    docs = _skewed_docs(spark)

    # the guard bounds the window's input: the mega source admits an
    # expected _QUOTA_CAP (=240) rows, never anything near its 40k size
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("_src_n"))
    surv = (
        q._quota_survivors(docs, counts)
        .groupBy("source")
        .count()
        .collect()
    )
    per_src = {r["source"]: r["count"] for r in surv}
    assert per_src["mega"] <= 4 * q._QUOTA_CAP, per_src  # expected 240, bound 960
    assert per_src["mega"] >= q._QUOTA_K  # exactness precondition holds
    for s in range(SMALL_SOURCES):
        assert per_src[f"s{s}"] == SMALL_N  # small sources untouched

    # and the guarded sample equals the unguarded reference, computed
    # independently in Python (hashlib md5, same ordering rule)
    got = {
        (r["doc_id"], r["source"], r["sample_rank"])
        for r in q.source_quota_sample(docs).collect()
    }
    want = _expected_sample(
        [(i, "mega") for i in range(MEGA_N)]
        + [
            (MEGA_N + s * SMALL_N + j, f"s{s}")
            for s in range(SMALL_SOURCES)
            for j in range(SMALL_N)
        ]
    )
    assert got == want


def test_quota_plan_filters_before_window(spark):
    """The committed physical plan must contain the cross-multiplication
    pre-filter BELOW the ranking Window (plans print top-down, so the
    Window's line index precedes the Filter's) — the length_quantiles
    treatment: guard the plan shape, not just the behavior."""
    df = q.q_source_quota_sample(spark, "/root/testdata/sf0.001")
    s = df._jdf.queryExecution().executedPlan().toString()
    lines = s.splitlines()
    win = [i for i, l in enumerate(lines) if "windowspecdefinition(" in l]
    # Catalyst fuses the guard into the BroadcastHashJoin condition (even
    # better than a standalone Filter) — find the cross-mult literal
    # wherever it landed
    guard = [i for i, l in enumerate(lines) if str(q._QUOTA_CAP * 65536) in l]
    assert win, s
    assert guard, s  # the guard predicate exists in the plan at all
    assert min(win) < min(guard), s  # ...and sits below the Window
