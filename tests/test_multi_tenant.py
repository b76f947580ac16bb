"""Multi-tenant config selection (reference app.py:261-301
``get_tenant_processor``): one job invocation serves several tenants,
each extracting with its OWN trained patterns; an unseen tenant falls
back to the default config (the reference's fresh default processor)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.core.config import ModelConfig
from coa_ocr_simple_spark.jobs.extract import parse_args, run, tenant_config_path

# the two tenant-trained fields live on colon-less lines, which the
# generic auto-discovery pass can NEVER pick up — only a tenant's trained
# pattern extracts them, so their presence proves which config ran
_COA_TEXT = (
    "Certificate of Analysis\n"
    "Lot Number: L-77\n"
    "Acidity index 6.8 units\n"
    "Shade grade 12 units\n"
)


def _write_corpus(tmp_path, tenants):
    docs = [
        {
            "doc_id": f"doc-{i:04d}",
            "tenant_id": tenant,
            "spans": [
                {"kind": "text", "text": _COA_TEXT, "media_ref": None, "offset": 0}
            ],
        }
        for i, tenant in enumerate(tenants)
    ]
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("tenant_id", pa.string()),
            (
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),
                        ]
                    )
                ),
            ),
        ]
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(docs, schema=schema), path)
    return path


def _tenant_config(field: str, pattern: str) -> ModelConfig:
    return ModelConfig(
        document_schemas={
            "coa": {"sections": [], "required_fields": [field], "auto_trained": []}
        },
        field_patterns={"coa": {field: pattern}},
    )


def test_two_tenants_extract_with_different_trained_patterns(spark, tmp_path):
    docs_path = _write_corpus(
        tmp_path, ["acme", "acme", "globex", "globex", "unknown-tenant"]
    )
    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    # acme trained an acidity field; globex trained a shade-grade field
    _tenant_config("ph_value", r"(?i)Acidity\s+index\s+([\d.]+)").save(
        tenant_config_path(str(cfg_dir), "acme")
    )
    _tenant_config("color_index", r"(?i)Shade\s+grade\s+(\d+)").save(
        tenant_config_path(str(cfg_dir), "globex")
    )

    out = str(tmp_path / "extracted")
    summary = run(
        parse_args(
            [
                "--input", docs_path, "--output", out, "--run-id", "mt1",
                "--tenants", "acme,globex", "--config-dir", str(cfg_dir),
            ]
        ),
        spark,
    )
    assert summary["docs_written"] == 5

    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 5
    by_tenant = {}
    for r in rows.values():
        by_tenant.setdefault(r["_tenant_id"], []).append(r)

    for r in by_tenant["acme"]:
        assert r["entities"]["ph_value"] == "6.8"
        assert "color_index" not in r["entities"]
    for r in by_tenant["globex"]:
        assert r["entities"]["color_index"] == "12"
        assert "ph_value" not in r["entities"]
    # unseen tenant -> default (empty) config: no trained fields, but the
    # rule-based pass still runs (lot number present in the text)
    (u,) = by_tenant["unknown-tenant"]
    assert "ph_value" not in u["entities"] and "color_index" not in u["entities"]
    assert u["entities"]["batch_number"] == "L-77"


def test_single_tenant_without_tenant_column(spark, tmp_path):
    """The reference's one-request-one-tenant shape: --tenants with one id
    and no tenant column applies that tenant's config to every doc."""
    docs = [
        {
            "doc_id": "doc-0",
            "spans": [
                {"kind": "text", "text": _COA_TEXT, "media_ref": None, "offset": 0}
            ],
        }
    ]
    from coa_ocr_simple_spark.fixtures.generate import DOCS_SCHEMA

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(docs, schema=DOCS_SCHEMA), path)
    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    _tenant_config("ph_value", r"(?i)Acidity\s+index\s+([\d.]+)").save(
        tenant_config_path(str(cfg_dir), "acme")
    )
    out = str(tmp_path / "extracted")
    run(
        parse_args(
            [
                "--input", path, "--output", out, "--run-id", "mt2",
                "--tenants", "acme", "--config-dir", str(cfg_dir),
            ]
        ),
        spark,
    )
    (row,) = spark.read.parquet(out).collect()
    assert row["entities"]["ph_value"] == "6.8"


def test_default_branch_carries_tenant_without_join_back(spark, tmp_path):
    """Round-2 verdict item 7: the unknown-tenant branch must re-emit
    _tenant_id as a passthrough column from its own subplan — zero Join
    nodes anywhere in a media-less multi-tenant plan."""
    from coa_ocr_simple_spark.plans.extract_plan import build_multi_tenant_plan

    docs_path = _write_corpus(tmp_path, ["acme", "unknown-a", "unknown-b"])
    docs = spark.read.parquet(docs_path)
    plan = build_multi_tenant_plan(
        docs,
        None,
        tenant_configs={
            "acme": _tenant_config("ph_value", r"(?i)Acidity\s+index\s+([\d.]+)")
        },
    )
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in s, s
    rows = plan.collect()
    assert {r["_tenant_id"] for r in rows} == {"acme", "unknown-a", "unknown-b"}
    assert len(rows) == 3
