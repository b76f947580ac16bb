"""Direct parity: core.process_document vs the reference implementation.

Imports /root/reference/ai_document_processor.py (read-only, public) and
runs a FRESH processor per document (no pickle on disk), which is exactly
the frozen-config semantics our engine pins (SURVEY.md §4.3.1).  In this
environment transformers/sklearn are absent, so the reference's
classify_document deterministically reduces to pattern_based_classification
— the same parity path we implement.

Normalization applied to the *reference* side only (SURVEY.md §4.3.2):
``hazard_codes``/``cas_numbers`` are ``list(set(...))`` there (order
nondeterministic) and sorted-unique here.
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import pytest

from coa_ocr_simple_spark.core import EMPTY_CONFIG, process_document
from coa_ocr_simple_spark.fixtures.generate import (
    CANONICAL_COA,
    EDGE_CASES,
    SEED,
    template_coa,
    template_html,
    template_sds,
    template_tds,
)

REFERENCE = "/root/reference/ai_document_processor.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE), reason="reference snapshot not available"
)


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("reference_ai", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reference_ai"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def reference_mod():
    return _load_reference_module()


@pytest.fixture()
def fresh_reference(reference_mod, tmp_path, monkeypatch):
    """A factory producing a pristine reference processor per call."""
    counter = {"n": 0}

    def make():
        counter["n"] += 1
        monkeypatch.setenv(
            "MODEL_STATE_PATH", str(tmp_path / f"state_{counter['n']}.pkl")
        )
        return reference_mod.AIDocumentProcessor()

    return make


def _normalize(result: dict) -> dict:
    out = dict(result)
    entities = dict(out.get("entities", {}))
    for key in ("hazard_codes", "cas_numbers"):
        if key in entities and isinstance(entities[key], list):
            entities[key] = sorted(set(entities[key]))
    out["entities"] = entities
    out.pop("similar_documents", None)  # always [] under fresh state on both sides
    return out


def _bodies() -> list[tuple[str, str]]:
    rng = random.Random(SEED)
    bodies = [("canonical_coa", CANONICAL_COA)]
    for i in range(8):
        bodies.append((f"coa_{i}", template_coa(rng)))
        bodies.append((f"sds_{i}", template_sds(rng)))
        bodies.append((f"tds_{i}", template_tds(rng)))
    # raw HTML fed as text: both sides see identical unstripped markup
    bodies.append(("raw_html", template_html(rng)))
    bodies.extend(EDGE_CASES)
    return bodies


@pytest.mark.parametrize("name,body", _bodies())
def test_process_document_matches_reference(name, body, fresh_reference):
    reference = fresh_reference()
    expected = _normalize(reference.process_document(body))
    actual = _normalize(process_document(body, EMPTY_CONFIG))
    assert actual["document_type"] == expected["document_type"], name
    assert actual["confidence"] == pytest.approx(expected["confidence"]), name
    assert actual["entities"] == expected["entities"], name
    assert actual["sections"] == expected["sections"], name
    assert actual["full_text"] == expected["full_text"], name


def test_trained_pattern_pass_matches_reference(fresh_reference):
    """Config-pinned trained patterns == reference field_patterns state."""
    reference = fresh_reference()
    reference.document_schemas["coa"] = {
        "sections": [],
        "required_fields": ["ph_value", "color_index"],
    }
    reference.field_patterns["coa"] = {
        "ph_value": r"(?i)pH\s*[:.]\s*([\d.]+)",
        "color_index": r"(?i)Color\s+Index\s*[:.]\s*(\w+)",
        "broken": r"(?i)(unclosed[",  # bad trained pattern must be skipped
    }
    text = "Certificate of Analysis\nLot Number: L1\npH: 6.8\nColor Index: APHA10\n"
    expected = reference.extract_entities_with_patterns(text, "coa")

    from coa_ocr_simple_spark.core import ModelConfig, extract_entities_with_patterns

    config = ModelConfig(
        document_schemas={"coa": {"sections": [], "required_fields": ["ph_value", "color_index"]}},
        field_patterns={"coa": dict(reference.field_patterns["coa"])},
    )
    assert extract_entities_with_patterns(text, "coa", config) == expected


def test_dynamic_required_field_default_pattern(fresh_reference):
    """ai:510-530: untrained required fields fall back to the default
    'field name: value' pattern inside extract_entities."""
    reference = fresh_reference()
    reference.document_schemas["coa"] = {
        "sections": [],
        "required_fields": ["shelf_life"],
    }
    text = (
        "Certificate of Analysis\nBatch Number: AB123\nShelf Life: 24 months\n"
        "Lot Number: AB123\n"
    )
    expected = reference.extract_entities(text, "coa")

    from coa_ocr_simple_spark.core import ModelConfig, extract_entities

    config = ModelConfig(
        document_schemas={"coa": {"sections": [], "required_fields": ["shelf_life"]}}
    )
    actual = extract_entities(text, "coa", config)
    assert actual == expected
    assert actual["shelf_life"] == "24 months"
