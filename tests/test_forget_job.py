"""Delete propagation (forget job): ids vanish from the corpus, the
index's bulk AND streaming code areas, and the embeddings table; index
search can no longer return them; re-runs are idempotent no-ops."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from coa_ocr_simple_spark.jobs.ann_index import (
    parse_args as ann_args,
    run_build,
    run_search,
)
from coa_ocr_simple_spark.jobs.forget import parse_args, run

SF = "/root/testdata/sf0.001"
DELETED = [3, 7, 100, 205]  # 100 is a query id; 205 absent from nothing


def _setup(spark, tmp_path):
    docs = str(tmp_path / "documents.parquet")
    emb = str(tmp_path / "embeddings.parquet")
    # working copies (the job rewrites in place)
    spark.read.parquet(f"{SF}/documents.parquet").write.parquet(docs)
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(emb)
    index = str(tmp_path / "index")
    run_build(
        ann_args(
            ["build", "--embeddings", emb, "--index", index, "--coarse-lloyd"]
        ),
        spark,
    )
    dl = str(tmp_path / "deletes.parquet")
    spark.createDataFrame(
        [(i,) for i in DELETED], "doc_id long"
    ).write.parquet(dl)
    return docs, emb, index, dl


def test_forget_scrubs_everything_and_is_idempotent(spark, tmp_path):
    docs, emb, index, dl = _setup(spark, tmp_path)
    report = str(tmp_path / "report")

    summary = run(
        parse_args(
            [
                "--delete-list", dl,
                "--documents", docs,
                "--embeddings", emb,
                "--index", index,
                "--report", report,
            ]
        ),
        spark,
    )
    assert summary["n_removed_documents"] == len(DELETED)
    assert summary["n_removed_embeddings"] == len(DELETED)
    assert summary["n_removed_index_codes"] == len(DELETED)

    for path, key in ((docs, "doc_id"), (emb, "vec_id")):
        left = {
            r[key]
            for r in spark.read.parquet(path)
            .where(F.col(key).isin(DELETED))
            .collect()
        }
        assert left == set()
    codes_left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{index}/codes")
        .where(F.col("vec_id").isin(DELETED))
        .collect()
    }
    assert codes_left == set()

    # the audit report says where each id was found
    rep = {
        r["doc_id"]: (r["in_documents"], r["in_embeddings"], r["in_index_codes"])
        for r in spark.read.parquet(report).collect()
    }
    assert set(rep) == set(DELETED)
    assert all(v == (1, 1, 1) for v in rep.values())

    # a search against the scrubbed index never returns a deleted id
    hits = str(tmp_path / "hits")
    run_search(
        ann_args(
            [
                "search", "--index", index,
                "--queries", emb, "--output", hits,
                "--nprobe", "2", "--rerank", "8", "--vectors", emb,
            ]
        ),
        spark,
    )
    returned = {
        r["neighbor_id"] for r in spark.read.parquet(hits).collect()
    }
    assert not (returned & set(DELETED))

    # idempotent re-run: nothing left to remove, all-zero report rows
    summary2 = run(
        parse_args(
            [
                "--delete-list", dl,
                "--documents", docs,
                "--embeddings", emb,
                "--index", index,
                "--report", report,
            ]
        ),
        spark,
    )
    assert summary2["n_removed_documents"] == 0
    assert summary2["n_removed_embeddings"] == 0
    assert summary2["n_removed_index_codes"] == 0
    rep2 = {
        r["doc_id"]: (r["in_documents"], r["in_embeddings"], r["in_index_codes"])
        for r in spark.read.parquet(report).collect()
    }
    assert all(v == (0, 0, 0) for v in rep2.values())
    spark.catalog.clearCache()


def test_forget_scrubs_stream_ingest_area(spark, tmp_path):
    docs, emb, index, dl = _setup(spark, tmp_path)
    # simulate a streaming-ingested batch containing a deleted id
    base = spark.read.parquet(f"{index}/codes")
    base.where(F.col("vec_id").isin([3, 7, 9])).write.parquet(
        f"{index}/codes_stream/batch=0"
    )
    summary = run(
        parse_args(["--delete-list", dl, "--index", index]), spark
    )
    assert summary["n_removed_index_stream_codes"] == 2  # ids 3 and 7
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{index}/codes_stream/batch=0").collect()
    }
    assert left == {9}
    shutil.rmtree(f"{index}/codes_stream")
    spark.catalog.clearCache()
