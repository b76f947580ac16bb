"""jobs/curate.py — the curation funnel as a job: quality gate -> exact
dedup -> near-dup removal, curated subset written by doc_id semi-join."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.curate import parse_args, run


def _corpus(tmp_path):
    rng = random.Random(7)
    vocab = [f"word{j}" for j in range(500)]
    stop = ["the", "and", "of", "to", "in", "is"]
    rows = []
    for i in range(20):  # distinct quality docs
        words = [
            rng.choice(stop) if k % 4 == 0 else rng.choice(vocab) for k in range(60)
        ]
        rows.append({"doc_id": i, "text": " ".join(words)})
    for i in range(20, 25):  # exact duplicates of doc 0
        rows.append({"doc_id": i, "text": rows[0]["text"]})
    for i in range(25, 28):  # near-duplicates of doc 1
        rows.append({"doc_id": i, "text": rows[1]["text"] + f" x{i}"})
    for i in range(28, 32):  # junk: no stopwords -> quality gate drops
        rows.append({"doc_id": i, "text": "zzz qqq xxx " * 10})
    for r in rows:
        r.update({"lang": "en", "source": "s", "n_chars": len(r["text"])})
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


def test_curate_funnel_stages_and_output(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated")
    report = str(tmp_path / "report")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--report", report]
        ),
        spark,
    )
    assert summary == {
        "n_total": 32,
        "n_quality": 28,  # 4 junk dropped
        "n_after_exact_dedup": 23,  # 5 exact dups collapsed to doc 0
        "n_curated": 20,  # 3 near-dups of doc 1 dropped
        "jaccard_min": 80,
        "near_dup_policy": "pair_loser",
    }
    curated = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in curated.collect()) == list(range(20))
    # full input columns preserved
    assert set(curated.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    rep = {r["stage"]: r["n_docs"] for r in spark.read.parquet(report).collect()}
    assert rep == {
        "n_total": 32,
        "n_quality": 28,
        "n_after_exact_dedup": 23,
        "n_curated": 20,
    }


def test_curate_jaccard_threshold_disables_neardup_stage(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated2")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--jaccard-min", "101"]
        ),
        spark,
    )
    assert summary["n_curated"] == summary["n_after_exact_dedup"] == 23


def test_curate_cluster_reps_keeps_one_per_component(spark, tmp_path):
    """--cluster-reps: near-dup removal keeps exactly ONE representative
    (min doc_id) per connected component of the pair graph — on this
    corpus (docs 25-27 all near-dups of doc 1, one component) the result
    matches the pair rule, and the one-rep-per-cluster property holds."""
    from coa_ocr_simple_spark.plans.driver_queries_dedup import neardup_clusters

    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated_cr")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--cluster-reps"]
        ),
        spark,
    )
    assert summary["near_dup_policy"] == "cluster_reps"
    assert summary["n_curated"] == 20
    curated = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert curated == set(range(20))

    # property: for every near-dup component, at most its min-id member
    # survives — and it does survive when it passed the earlier stages
    clusters = neardup_clusters(spark.read.parquet(docs_path)).collect()
    by_cluster: dict = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for rep, members in by_cluster.items():
        assert curated & members <= {rep}
