"""Accuracy-property tests for the sketch operators (HLL / Bloom / CMS).

DuckDB value parity is already enforced for all three by
tests/test_extra_oracles.py (they are extra-registry entries); these
tests pin the properties that make a sketch a *correct* sketch rather
than just a deterministic one:

- HLL: the estimate tracks the true distinct count in BOTH regimes —
  linear counting at small cardinality, raw bias-corrected harmonic
  mean at mid cardinality (the sf corpora only exercise the small
  range: ~31 distinct terms per source).
- Bloom: NO false negatives ever (a set paragraph always probes set),
  false positives rare.
- CMS: never underestimates, overestimate bounded by the sketch width.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from coa_ocr_simple_spark.plans.driver_queries_sketch import (
    _CMS_PROBE_MOD,
    _CMS_PROBE_RES,
    _CMS_W,
    bloom_decontaminate,
    cms_term_counts,
    hll_distinct_terms,
)

SF = "/root/testdata/sf0.001"


def _docs_df(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _synth_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# --- HLL -----------------------------------------------------------------------


def test_hll_small_range_tracks_exact(spark):
    docs = _docs_df(spark)
    est = {
        r["source"]: r["est_distinct"]
        for r in hll_distinct_terms(docs).collect()
    }
    exact = {
        r["source"]: r["d"]
        for r in docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .groupBy("source")
        .agg(F.countDistinct("term").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for src, d in exact.items():
        assert abs(est[src] - d) <= max(2, 0.15 * d), (src, est[src], d)


def test_hll_mid_range_tracks_exact(spark):
    # 4000 distinct single-occurrence terms per source: far above the
    # 2.5m linear-counting threshold, so the raw harmonic-mean branch
    # is the one under test (sigma = 1.04/sqrt(256) = 6.5%; 25% is >3
    # sigma plus integer-rounding slack)
    rows = [
        (int(s * 4000 + i), f"s{s}", " ".join(f"w{s}_{i}_{j}" for j in range(40)))
        for s in range(2)
        for i in range(100)
    ]
    out = {
        r["source"]: r for r in hll_distinct_terms(_synth_docs(spark, rows)).collect()
    }
    for s in range(2):
        r = out[f"s{s}"]
        assert abs(r["est_distinct"] - 4000) <= 1000, dict(r.asDict())
        # raw-branch evidence: at n/m ~ 15.6 essentially no register
        # stays empty, so linear counting cannot have produced this
        assert r["n_zero_registers"] <= 2


# --- Bloom ---------------------------------------------------------------------


def test_bloom_no_false_negatives_and_rare_false_positives(spark):
    # train docs (doc_id % 10 != 0) plant 300 known paragraphs; eval
    # docs (doc_id % 10 == 0) mix truly-contaminated lines with clean
    # ones.  Every contaminated line MUST be flagged; clean lines may
    # false-positive only at the bloom's designed rate (~0.1% here —
    # allow 10x headroom).
    planted = [f"shared boiler plate line number {i}" for i in range(300)]
    # train doc ids are all = 1 (mod 10) so none falls into the eval
    # split, and the 100 slices of 3 tile planted[0:300] completely
    train_rows = [
        (10 * i + 1, "tr", "\n".join(planted[3 * i : 3 * i + 3]))
        for i in range(100)
    ]
    ev_rows = [
        (
            10 * k,
            "ev",
            "\n".join(
                [planted[k], planted[k + 50], f"unique clean line {k} a", f"unique clean line {k} b"]
            ),
        )
        for k in range(100)
    ]
    docs = _synth_docs(spark, train_rows + ev_rows)
    out = {r["doc_id"]: r for r in bloom_decontaminate(docs).collect()}
    assert len(out) == 100
    n_extra = 0
    for k in range(100):
        r = out[10 * k]
        assert r["n_paragraphs"] == 4
        assert r["n_flagged"] >= 2, dict(r.asDict())  # both planted lines
        n_extra += r["n_flagged"] - 2
    assert n_extra <= 2, n_extra  # 200 clean lines, ~0.1% designed FP rate


def test_bloom_benign_on_generic_corpus(spark):
    # the sf corpus has no cross-split duplicate paragraphs: everything
    # must come back unflagged (pure false-positive surface)
    out = bloom_decontaminate(_docs_df(spark)).agg(
        F.sum("n_paragraphs").alias("np"), F.sum("n_flagged").alias("nf")
    ).collect()[0]
    assert out["np"] > 0
    assert out["nf"] <= max(1, out["np"] // 100)


# --- CMS -----------------------------------------------------------------------


def test_cms_never_underestimates_and_collisions_are_bounded(spark):
    # vocabulary ~6x the sketch width forces real collisions; the probe
    # slice (doc_id % 100 == 7) supplies the queried terms
    rows = [
        (i, "s", " ".join(f"t{(i * 97 + j) % (6 * _CMS_W)}" for j in range(200)))
        for i in range(500)
    ]
    docs = _synth_docs(spark, rows)
    out = cms_term_counts(docs).collect()
    assert out, "probe slice must be non-empty"
    n_tokens = 500 * 200
    n_over = 0
    for r in out:
        assert r["est_count"] >= r["exact_count"], dict(r.asDict())
        # classic CMS bound: P(over > e*N/w) < e^-d; allow the full
        # e*N/w once (w=16384, N=100k -> ~17)
        assert r["est_count"] - r["exact_count"] <= 3 * n_tokens // _CMS_W
        n_over += int(r["est_count"] > r["exact_count"])
    # with |vocab| ~ 6w the no-collision outcome is impossible
    assert n_over > 0


def test_cms_probe_slice_is_the_contract(spark):
    docs = _docs_df(spark)
    probe_terms = {
        r["term"]
        for r in docs.where(F.col("doc_id") % _CMS_PROBE_MOD == _CMS_PROBE_RES)
        .select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
        )
        .distinct()
        .collect()
    }
    out_terms = {r["term"] for r in cms_term_counts(docs).collect()}
    assert out_terms == probe_terms


def test_hll_overlap_tracks_exact_intersection(spark):
    """hll_source_overlap: the inclusion-exclusion overlap estimate
    tracks the TRUE distinct-term intersection for every source pair
    (256-register HLL standard error ~6.5%; the compounded bound here
    is 15%), the union estimate is never below either single side, and
    the overlap never exceeds the smaller side's estimate + tolerance."""
    from coa_ocr_simple_spark.plans.driver_queries_sketch import (
        hll_source_overlap,
    )

    docs = _docs_df(spark)
    rows = hll_source_overlap(docs).collect()
    spark.catalog.clearCache()
    assert rows

    terms = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
        .collect()
    )
    by_src = {}
    for r in terms:
        by_src.setdefault(r["source"], set()).add(r["term"])
    for r in rows:
        true = len(by_src[r["source_a"]] & by_src[r["source_b"]])
        assert abs(r["est_overlap"] - true) <= max(3, 0.15 * true), (
            r["source_a"],
            r["source_b"],
            r["est_overlap"],
            true,
        )
        assert r["est_union"] >= max(r["est_a"], r["est_b"])
        assert r["est_overlap"] <= min(r["est_a"], r["est_b"])


def test_vocab_redundancy_tracks_exact(spark):
    """hll_vocab_redundancy: the redundancy factor tracks the exact
    (sum-of-singles / true-union) ratio within sketch tolerance, and the
    union estimate is bounded by [max single, sum of singles]."""
    from coa_ocr_simple_spark.plans.driver_queries_sketch import (
        hll_vocab_redundancy,
    )

    docs = _docs_df(spark)
    row = hll_vocab_redundancy(docs).collect()[0]
    spark.catalog.clearCache()

    terms = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
        .collect()
    )
    by_src = {}
    allv = set()
    for r in terms:
        by_src.setdefault(r["source"], set()).add(r["term"])
        allv.add(r["term"])
    true_sum = sum(len(s) for s in by_src.values())
    true_union = len(allv)
    assert row["n_sources"] == len(by_src)
    assert abs(row["union_est"] - true_union) <= max(3, 0.15 * true_union)
    true_red = true_sum * 1000 // true_union
    assert abs(row["redundancy_mille"] - true_red) <= 0.2 * true_red
    assert row["union_est"] <= row["sum_single_est"]


def test_source_contribution_tracks_exact_leave_one_out(spark):
    """hll_source_contribution: est_unique tracks the TRUE leave-one-out
    unique-vocabulary count per source, register dominance holds
    (est_rest <= est_all, est_single <= est_all), and the per-mille
    shares never sum above 1000 + tolerance (unique sets are disjoint
    subsets of the union)."""
    from coa_ocr_simple_spark.plans.driver_queries_sketch import (
        hll_source_contribution,
    )

    docs = _docs_df(spark)
    rows = hll_source_contribution(docs).collect()
    spark.catalog.clearCache()
    assert rows

    terms = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
        .collect()
    )
    by_src = {}
    allv = set()
    for r in terms:
        by_src.setdefault(r["source"], set()).add(r["term"])
        allv.add(r["term"])
    assert {r["source"] for r in rows} == set(by_src)
    for r in rows:
        rest = set()
        for s, v in by_src.items():
            if s != r["source"]:
                rest |= v
        true_unique = len(allv) - len(rest)
        assert abs(r["est_unique"] - true_unique) <= max(3, 0.15 * len(allv)), (
            r["source"],
            r["est_unique"],
            true_unique,
        )
        assert r["est_rest"] <= r["est_all"]
        assert r["est_single"] <= r["est_all"]
        assert r["unique_mille"] == r["est_unique"] * 1000 // r["est_all"]
    assert sum(r["unique_mille"] for r in rows) <= 1000 + 50 * len(rows)
