"""Bucketed co-located media join (the 100 TB shuffle-elimination story)
+ distributed span-order recovery from shuffled offsets."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from coa_ocr_simple_spark.core import EMPTY_CONFIG, extract_document
from coa_ocr_simple_spark.plans.extract_plan import ExtractOptions, build_extract_plan


def test_bucketed_media_join_skips_media_shuffle(spark, parity_corpus, tmp_path):
    """When the media store is a bucketed table on media_ref, the join
    reads it shuffle-free: no Exchange above the bucketed scan.  At 10^12
    docs this removes the full shuffle of the (large) media store on every
    run — only the exploded spans side still exchanges."""
    media = spark.read.parquet(parity_corpus["media_path"])
    spark.sql("DROP TABLE IF EXISTS media_bucketed")
    (
        media.write.bucketBy(8, "media_ref")
        .sortBy("media_ref")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("media_bucketed")
    )
    bucketed = spark.table("media_bucketed")

    spans = (
        spark.read.parquet(parity_corpus["docs_path"])
        .select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .select("doc_id", F.col("span.media_ref").alias("media_ref"))
        .where(F.col("media_ref").isNotNull())
    )
    # force a shuffle-eligible join (no broadcast) to expose bucketing
    joined = spans.hint("merge").join(bucketed, "media_ref")
    plan = joined._jdf.queryExecution().executedPlan().toString()

    # the media (bucketed) side must have no Exchange between its scan and
    # the join; the spans side still exchanges — so exactly ONE exchange
    n_exchanges = plan.count("Exchange")
    assert "SortMergeJoin" in plan
    assert n_exchanges == 1, plan
    assert joined.count() == media.count()  # every ref resolved exactly once
    spark.sql("DROP TABLE IF EXISTS media_bucketed")


def test_pipeline_recovers_shuffled_offsets(spark, tmp_path):
    """Spans arrive in arbitrary array order with non-contiguous offsets;
    the pipeline must emit them offset-sorted with rank-normalized offsets,
    equal to the oracle."""
    rng = random.Random(11)
    docs = []
    for i in range(40):
        parts = [
            ("text", f"Certificate of Analysis {i}", None),
            ("text", f"Batch Number: B{i:04d}", None),
            ("text", f"Purity: 9{i % 10}.5%", None),
            ("text", "This lot conforms.", None),
        ]
        offsets = sorted(rng.sample(range(100), len(parts)))
        spans = [
            {"kind": k, "text": t, "media_ref": m, "offset": off}
            for (k, t, m), off in zip(parts, offsets)
        ]
        rng.shuffle(spans)  # array order != offset order
        docs.append({"doc_id": f"doc-{i:04d}", "spans": spans})

    from coa_ocr_simple_spark.fixtures.generate import DOCS_SCHEMA
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "shuffled.parquet")
    pq.write_table(pa.Table.from_pylist(docs, schema=DOCS_SCHEMA), path)

    result = build_extract_plan(
        spark.read.parquet(path),
        None,
        options=ExtractOptions(run_id="shuffled"),
    )
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in result.collect()}
    for doc in docs:
        oracle = extract_document(
            doc["doc_id"], doc["spans"], lambda ref: ([], []), EMPTY_CONFIG
        )
        actual = rows[doc["doc_id"]]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in actual["out_spans"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle["out_spans"]
        ]
        assert [s["offset"] for s in actual["out_spans"]] == [0, 1, 2, 3]
        assert actual["entities"] == {
            k: v
            for k, v in oracle["entities"].items()
            if not isinstance(v, (list, dict))
        }


def test_bucket_pair_generation_matches_naive_reference(spark):
    """The groupBy-bucket pair generator (driver_queries_dedup.
    _pairs_within_buckets) must emit exactly the pairs a naive nested
    loop would, across randomized inputs — including buckets at, above,
    and below the hot-bucket cap, and ids arriving in shuffled order."""
    import itertools
    import random

    from coa_ocr_simple_spark.plans.driver_queries_dedup import (
        _MAX_BUCKET,
        _pairs_within_buckets,
    )

    rng = random.Random(23)
    for trial in range(4):
        rows = []
        sizes = [1, 2, 3, 7, _MAX_BUCKET, _MAX_BUCKET + 1, rng.randint(2, 40)]
        for b, size in enumerate(sizes):
            ids = [f"id-{b}-{i:05d}" for i in range(size)]
            rng.shuffle(ids)
            rows += [(str(b % 3), f"sig-{b}", i) for i in ids]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "band string, sig string, doc_id string")
        got = {
            (r["doc_a"], r["doc_b"])
            for r in _pairs_within_buckets(df, ["band", "sig"], "doc_id", "doc_a", "doc_b").collect()
        }

        buckets = {}
        for band, sig, i in rows:
            buckets.setdefault((band, sig), []).append(i)
        want = set()
        for ids in buckets.values():
            if 2 <= len(ids) <= _MAX_BUCKET:
                for a, b2 in itertools.combinations(sorted(ids), 2):
                    want.add((a, b2))
        assert got == want, f"trial {trial}: {len(got)} vs {len(want)}"
