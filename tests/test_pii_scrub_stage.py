"""curate --pii-scrub: planted PII is redacted in the shipped payload,
clean docs are byte-identical, and the summary counts every match."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.curate import parse_args, run


def _corpus(tmp_path):
    rng = random.Random(11)
    vocab = [f"word{j}" for j in range(400)]
    stop = ["the", "and", "of", "to", "in", "is"]

    def prose(n):
        return " ".join(
            rng.choice(stop) if k % 4 == 0 else rng.choice(vocab)
            for k in range(n)
        )

    rows = []
    # clean docs
    for i in range(8):
        rows.append({"doc_id": i, "text": prose(60)})
    # docs with planted PII (2 matches each): email+phone, ip+ssn, 2 cards
    rows.append(
        {
            "doc_id": 8,
            "text": f"{prose(30)} contact bob@example.com or 555-123-4567 "
            + prose(30),
        }
    )
    rows.append(
        {
            "doc_id": 9,
            "text": f"{prose(30)} host 10.0.0.300 ssn 123-45-6789 "
            + prose(30),
        }
    )
    rows.append(
        {
            "doc_id": 10,
            "text": f"{prose(30)} cards 4532015112830366 1234567812345678 "
            + prose(30),
        }
    )
    for r in rows:
        r.update({"lang": "en", "source": "s", "n_chars": len(r["text"])})
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


def test_pii_scrub_redacts_and_counts(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--pii-scrub"]
        ),
        spark,
    )
    assert summary["n_pii_matches_scrubbed"] == 6

    curated = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert "<EMAIL>" in curated[8]["text"]
    assert "<PHONE>" in curated[8]["text"]
    assert "bob@example.com" not in curated[8]["text"]
    # recall-biased: the out-of-range IP candidate is scrubbed too
    assert "<IP>" in curated[9]["text"]
    assert "<SSN>" in curated[9]["text"]
    assert curated[10]["text"].count("<CC>") == 2
    # n_chars tracks the rewritten payload
    for i in (8, 9, 10):
        assert curated[i]["n_chars"] == len(curated[i]["text"])
    # clean docs byte-identical
    src = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(docs_path).collect()
    }
    for i in range(8):
        if i in curated:  # quality/dedup stages may drop none here
            assert curated[i]["text"] == src[i]


def test_pii_scrub_composes_with_rewrites(spark, tmp_path):
    """--pii-scrub runs after --c4-clean without resurrecting PII."""
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated2")
    summary = run(
        parse_args(
            [
                "--input",
                docs_path,
                "--output",
                out,
                "--c4-clean",
                "--pii-scrub",
            ]
        ),
        spark,
    )
    assert summary["n_pii_matches_scrubbed"] >= 0
    for r in spark.read.parquet(out).collect():
        assert "bob@example.com" not in r["text"]
        assert "4532015112830366" not in r["text"]
