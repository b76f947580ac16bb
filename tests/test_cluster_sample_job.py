"""cluster_sample job: CLI output equals the oracle-checked extras
query at the default quota, payload semi-join works, re-runs replace."""

from __future__ import annotations

import __spark_entry__ as entrymod
from coa_ocr_simple_spark.jobs.cluster_sample import parse_args, run

SF = "/root/testdata/sf0.001"


def test_job_matches_registry_query_and_reruns_clean(spark, tmp_path):
    sample = str(tmp_path / "sample")
    out = str(tmp_path / "docs_out")
    summary = run(
        parse_args(
            [
                "--embeddings", f"{SF}/embeddings.parquet",
                "--sample", sample,
                "--documents", f"{SF}/documents.parquet",
                "--output", out,
            ]
        ),
        spark,
    )
    got = sorted(tuple(r) for r in spark.read.parquet(sample).collect())
    ref = sorted(
        tuple(r)
        for r in entrymod.extra_queries()["cluster_quota_sample"](
            spark, SF
        ).collect()
    )
    spark.catalog.clearCache()
    assert got == ref
    assert summary["n_sampled"] == len(ref)
    assert summary["quota"] == 15

    # payload rows are exactly the docs whose doc_id was sampled AND
    # exists in the documents table (vec_ids range over the same domain)
    doc_ids = {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    all_docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    sampled = {t[0] for t in ref}
    assert doc_ids == (sampled & all_docs)

    # re-run replaces, never accumulates
    summary2 = run(
        parse_args(
            ["--embeddings", f"{SF}/embeddings.parquet", "--sample", sample]
        ),
        spark,
    )
    assert summary2["n_sampled"] == summary["n_sampled"]
    again = sorted(tuple(r) for r in spark.read.parquet(sample).collect())
    assert again == ref
    spark.catalog.clearCache()


def test_smaller_quota_is_prefix_of_default(spark, tmp_path):
    """quota=5 must pick exactly the rank<=5 rows of the quota=15
    sample (md5 rank order is quota-independent)."""
    s15 = str(tmp_path / "s15")
    s5 = str(tmp_path / "s5")
    run(
        parse_args(
            ["--embeddings", f"{SF}/embeddings.parquet", "--sample", s15]
        ),
        spark,
    )
    run(
        parse_args(
            [
                "--embeddings", f"{SF}/embeddings.parquet",
                "--sample", s5, "--quota", "5",
            ]
        ),
        spark,
    )
    top15 = {
        (r["vec_id"], r["centroid_id"], r["sample_rank"])
        for r in spark.read.parquet(s15).collect()
        if r["sample_rank"] <= 5
    }
    got5 = {
        (r["vec_id"], r["centroid_id"], r["sample_rank"])
        for r in spark.read.parquet(s5).collect()
    }
    assert got5 == top15
    spark.catalog.clearCache()
