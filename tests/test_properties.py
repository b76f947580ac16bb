"""Property-based tests (hypothesis) — SURVEY.md §5.2.5.

Invariants that must hold on arbitrary unicode input: no extractor
function ever throws; discovery field-name normalization is idempotent and
never yields stopwords; fingerprints are deterministic and length-bounded
in line count; decode page caps hold for any page list; classify outputs
stay within the reference's value domain.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from coa_ocr_simple_spark.core import (
    EMPTY_CONFIG,
    classify,
    decode_pdf,
    document_fingerprint,
    discover_fields,
    process_document,
    strip_html,
)
from coa_ocr_simple_spark.core.patterns import DISCOVERY_STOPWORDS

text_strategy = st.text(max_size=2000)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_process_document_never_throws_and_domain(text):
    result = process_document(text, EMPTY_CONFIG)
    assert result["document_type"] in {"coa", "sds", "tds", "unknown"}
    assert 0.0 <= result["confidence"] <= 0.95
    assert isinstance(result["entities"], dict)
    # all entity keys are strings; values are str, list, or the
    # test_results dict — exactly the reference's value domain
    for key, value in result["entities"].items():
        assert isinstance(key, str)
        assert isinstance(value, (str, list, dict))


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_discovery_normalization_and_stopwords(text):
    discovered = discover_fields(text, "coa", frozenset())
    for field_name in discovered:
        if field_name == "test_results":
            continue
        assert field_name not in DISCOVERY_STOPWORDS
        # normalization idempotent: already lowercase with no space/hyphen
        assert field_name == field_name.lower().replace(" ", "_").replace("-", "_")


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_fingerprint_deterministic_and_bounded(text):
    fp1 = document_fingerprint(text)
    assert fp1 == document_fingerprint(text)
    head, _, tail = fp1.rpartition("_L")
    assert tail == str(len(text) // 100)
    assert len(head) <= 40  # 20 lines x 2 chars


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(max_size=200), max_size=8),
    st.lists(st.text(max_size=200), max_size=8),
)
def test_decode_pdf_caps(direct, ocr):
    out = decode_pdf(direct, ocr)
    assert "--- Page 6 ---" not in out  # direct cap 5
    if len(out.strip()) <= 100 or not any(direct[:5]):
        assert "--- Page 3 ---" not in out  # ocr cap 2


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=1500))
def test_strip_html_never_throws(html):
    out = strip_html(html)
    assert isinstance(out, str)
    assert "<script" not in out.lower()


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_classify_confidence_matches_type(text):
    doc_type, conf = classify(text)
    if doc_type == "unknown":
        assert conf in (0.0, 0.1, 0.3)
    else:
        assert conf > 0
