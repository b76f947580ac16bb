"""curate --encoding-clean: planted encoding artifacts are stripped
from the shipped payload, clean docs are byte-identical, the summary
counts every artifact, and the stage composes with --pii-scrub (which
stays the final rewrite)."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.curate import parse_args, run
from coa_ocr_simple_spark.plans.driver_queries_corpus import (
    _CTL,
    _MOJI_E,
    _MOJI_Q,
    _REPL,
)


def _corpus(tmp_path):
    rng = random.Random(13)
    vocab = [f"word{j}" for j in range(400)]
    stop = ["the", "and", "of", "to", "in", "is"]

    def prose(n):
        # stopwords every 4th token so the default quality gate keeps
        # the docs (the gate drops stopword-free text by design)
        return " ".join(
            rng.choice(stop) if k % 4 == 0 else rng.choice(vocab)
            for k in range(n)
        )

    rows = []
    for i in range(6):
        rows.append({"doc_id": i, "text": prose(60)})
    # planted artifacts: 2 mojibake, 3 replacement chars, 2 controls
    rows.append(
        {"doc_id": 6, "text": f"caf{_MOJI_E} {prose(20)} it{_MOJI_Q}s fine"}
    )
    rows.append({"doc_id": 7, "text": _REPL * 3 + prose(20)})
    rows.append(
        {"doc_id": 8, "text": prose(10) + _CTL[0] + prose(10) + _CTL[2]}
    )
    # artifact adjacent to PII: both rewrites must land
    rows.append(
        {"doc_id": 9, "text": f"{_REPL}mail bob@example.com {prose(10)}"}
    )
    for r in rows:
        r.update({"lang": "en", "source": "s", "n_chars": len(r["text"])})
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


def test_encoding_clean_strips_and_counts(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--encoding-clean"]
        ),
        spark,
    )
    # 2 mojibake + 3 repl + 2 ctl + 1 repl-next-to-pii
    assert summary["n_encoding_artifacts_scrubbed"] == 8

    curated = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    for i in (6, 7, 8, 9):
        t = curated[i]["text"]
        for bad in [_MOJI_E, _MOJI_Q, _REPL] + _CTL:
            assert bad not in t
        assert curated[i]["n_chars"] == len(t)
    assert curated[6]["text"].startswith("caf ")  # only the digraph removed
    src = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(docs_path).collect()
    }
    for i in range(6):
        if i in curated:
            assert curated[i]["text"] == src[i]


def test_encoding_clean_composes_with_pii_scrub(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "curated2")
    summary = run(
        parse_args(
            [
                "--input",
                docs_path,
                "--output",
                out,
                "--encoding-clean",
                "--pii-scrub",
            ]
        ),
        spark,
    )
    assert summary["n_encoding_artifacts_scrubbed"] == 8
    assert summary["n_pii_matches_scrubbed"] >= 1
    doc9 = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}[9]
    assert _REPL not in doc9["text"]
    assert "bob@example.com" not in doc9["text"]
    assert "<EMAIL>" in doc9["text"]
