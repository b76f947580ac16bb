"""JSON-Lines ingestion: the raw-corpus format most training pipelines
start from, read through the same TableIO the jobs use."""

from __future__ import annotations

import json

from coa_ocr_simple_spark.jobs.extract import parse_args, run
from coa_ocr_simple_spark.sources.tables import TableIO


def _write_jsonl(path, docs):
    with open(path, "w", encoding="utf-8") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_extract_job_reads_jsonl_input(spark, tmp_path):
    docs = [
        {
            "doc_id": f"doc-{i:04d}",
            "spans": [
                {
                    "kind": "text",
                    "text": f"Certificate of Analysis\nLot Number: L-{i}",
                    "media_ref": None,
                    "offset": 0,
                }
            ],
        }
        for i in range(25)
    ]
    path = str(tmp_path / "docs.jsonl")
    _write_jsonl(path, docs)

    out = str(tmp_path / "extracted")
    summary = run(
        parse_args(["--input", path, "--output", out, "--run-id", "jl1"]),
        spark,
    )
    assert summary["docs_written"] == 25
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows["doc-0007"]["entities"]["batch_number"] == "L-7"


def test_tableio_json_schema_override(spark, tmp_path):
    """Explicit schema skips inference (the 100-TB requirement: inference
    is a full extra scan) and pins types."""
    path = str(tmp_path / "flat.jsonl")
    _write_jsonl(
        path,
        [{"doc_id": i, "text": f"t{i}", "n_chars": 2} for i in range(5)],
    )
    io = TableIO(spark)
    df = io.read(path, schema="doc_id long, text string, n_chars long")
    assert df.schema.simpleString() == "struct<doc_id:bigint,text:string,n_chars:bigint>"
    assert df.count() == 5
