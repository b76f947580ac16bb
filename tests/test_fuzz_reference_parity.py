"""Randomized parity vs the live reference: seed-fixed fuzzed documents
(template fragments + key-value noise + table rows + unicode junk shuffled
together) must produce identical process_document output from our frozen
core and a fresh reference processor.  Catches ordering/tie/dict-semantics
drift that curated fixtures might miss (SURVEY.md §4.3)."""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import pytest

from coa_ocr_simple_spark.core import EMPTY_CONFIG, process_document

REFERENCE = "/root/reference/ai_document_processor.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE), reason="reference snapshot not available"
)

FRAGMENTS = [
    "Certificate of Analysis",
    "SAFETY DATA SHEET",
    "TECHNICAL DATA SHEET",
    "Product Name: {w}",
    "Product: {w}",
    "Trade name: {w} Ultra",
    "CAS Number: {n2}-{n3}-{n1}",
    "CAS: 67-64-1",
    "Batch Number: AB{n3}",
    "Lot: L-{n3}",
    "Purity: 9{n1}.{n1}%",
    "Assay Result: {n2}.{n1}",
    "Appearance: Clear {w} liquid",
    "Appearance Visual - Colorless",
    "Density: 0.{n2} g/cm3",
    "Density @ 20֯ C ASTM D 1298 g/ml 0.79 0.{n2}",
    "Viscosity: {n2}.0 mPas",
    "Flash Point: {n2} °C",
    "Storage: Store at 5-25°C",
    "SECTION {n1}: Identification",
    "SECTION 2: Hazards identification",
    "Hazard statements: H2{n2}, H3{n2}",
    "Emergency telephone: +1 555-{n3}-{n3}",
    "Manufacturer: {w} Corp",
    "Parameter  Specification  Result",
    "Test  Spec  Value",
    "Purity  >= 99.0 %  99.{n1} %",
    "Water content  <= 0.5 %  0.{n2} %",
    "pH  6.{n1}",
    "Identity Test: PASS",
    "Residue: <10 ppm - {n1} ppm",
    "This lot conforms to specification.",
    "Analysis Date: 1{n1}/0{n1}/202{n1}",
    "HS Code: 2914{n3}",
    "{w} {w} {w} {w}",
    "  ",
    "– degree ֯ µ unicode —",
    "the: should be skipped",
    "Recommended for {w}.",
    "Technical Properties",
    "physical properties",
    "quality release",
    "for laboratory use only",
]

WORDS = ["Acetone", "Ethanol", "Glycerol", "Toluene", "Xylene", "Resin"]


def _fuzz_doc(rng: random.Random) -> str:
    n_lines = rng.randint(3, 25)
    lines = []
    for _ in range(n_lines):
        frag = rng.choice(FRAGMENTS)
        lines.append(
            frag.format(
                w=rng.choice(WORDS),
                n1=rng.randint(0, 9),
                n2=rng.randint(10, 99),
                n3=rng.randint(100, 999),
            )
        )
    return "\n".join(lines)


@pytest.fixture(scope="module")
def reference_mod():
    spec = importlib.util.spec_from_file_location("reference_ai_fuzz", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_ai_fuzz"] = mod
    spec.loader.exec_module(mod)
    return mod


def _normalize(result: dict) -> dict:
    entities = dict(result.get("entities", {}))
    for key in ("hazard_codes", "cas_numbers"):
        if key in entities and isinstance(entities[key], list):
            entities[key] = sorted(set(entities[key]))
    return {
        "document_type": result["document_type"],
        "confidence": round(result["confidence"], 12),
        "entities": entities,
        "sections": result["sections"],
    }


def test_fuzzed_documents_match_reference(reference_mod, tmp_path, monkeypatch):
    rng = random.Random(20260816)
    for i in range(120):
        text = _fuzz_doc(rng)
        monkeypatch.setenv("MODEL_STATE_PATH", str(tmp_path / f"s{i}.pkl"))
        reference = reference_mod.AIDocumentProcessor()
        expected = _normalize(reference.process_document(text))
        actual = _normalize(process_document(text, EMPTY_CONFIG))
        assert actual == expected, f"doc {i}:\n{text!r}"
