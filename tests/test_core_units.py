"""Unit tests on the pure core — golden values derived from reference
semantics (SURVEY.md §5.2.1): classification tie/zero/cap cases, field
banks against the reference's own example vectors
(/root/reference/app.py:688-738), table parse against the acetone fixture,
decode page caps, fingerprinting, HTML strip, and offline training."""

from __future__ import annotations

from coa_ocr_simple_spark.core import (
    EMPTY_CONFIG,
    ModelConfig,
    classify,
    decode_image,
    decode_pdf,
    document_fingerprint,
    extract_document,
    extract_entities,
    extract_sections,
    extract_test_results,
    fingerprint_similarity,
    process_document,
    strip_html,
    rows_from_test_results,
)
from coa_ocr_simple_spark.core.training import (
    auto_train_all_fields,
    create_context_pattern,
    reset_document_schema,
    set_field_pattern,
    train_from_field_value,
)
from coa_ocr_simple_spark.fixtures.generate import CANONICAL_COA

NOW = "2026-01-01 00:00:00"


# --- classification (ai:233-267) -----------------------------------------------


def test_classify_empty_and_zero_and_tie():
    assert classify("") == ("unknown", 0.0)
    assert classify("nothing relevant at all") == ("unknown", 0.1)
    # one SDS hit + one COA hit -> tie -> unknown/0.3
    assert classify("safety data sheet certificate of analysis") == ("unknown", 0.3)


def test_classify_majorities_and_cap():
    doc_type, conf = classify(CANONICAL_COA)
    assert doc_type == "coa"
    assert 0 < conf <= 0.95
    # all 10 COA patterns -> capped at 0.95
    all_coa = (
        "certificate of analysis c.o.a. analytical result test result "
        "batch analysis quality release purity analysis lot number "
        "batch number certified purity"
    )
    assert classify(all_coa) == ("coa", 0.95)
    assert classify("safety data sheet msds hazard identification")[0] == "sds"
    assert classify("technical data sheet physical properties")[0] == "tds"


# --- canonical acetone fixture golden values (ai banks) --------------------------


def test_canonical_coa_entities():
    """Golden values VERIFIED against a live run of the reference on its own
    fixture (not the FIXTURES.md sketch, which over-promises: the ASTM
    density pattern ai:485 requires ASTM directly after the degree token,
    so the reference itself extracts no density here, and the purity
    pattern's greedy ``\\d+(?:[^%]+)`` eats the leading 9 -> '7.01AC')."""
    result = process_document(CANONICAL_COA, EMPTY_CONFIG)
    assert result["document_type"] == "coa"
    assert result["confidence"] == 0.1  # 1/10 coa bank hits (ai:265)
    entities = result["entities"]
    assert entities["cas_number"] == "67-64-1"
    assert entities["appearance"] == "Colorless, Clear liquid Colorless, Clear liquid"
    assert "density" not in entities
    assert entities["purity"] == "7.01AC"
    # auto-discovered key-value fields (ai:712-753)
    assert entities["hs_code"] == "29141100"
    assert entities["date_of_issue"] == "98.03.07"
    assert "test_results" not in entities  # header regex needs a Spec column


def test_example_vectors_from_reference_ui():
    # /root/reference/app.py:688-738 example vectors
    text = "CAS Number: 67-64-1\nPurity: 99.8%\nBatch Number: ABC123\n"
    entities = extract_entities(text, "coa", EMPTY_CONFIG)
    assert entities["cas_number"] == "67-64-1"
    assert entities["purity"] == "99.8%"
    assert entities["batch_number"] == "ABC123"
    assert entities["lot_number"] == "ABC123"  # dual-key compat (ai:453-454)


# --- table parse (ai:575-660) ----------------------------------------------------


def test_table_parse_three_and_two_part_rows():
    text = (
        "Parameter  Specification  Result\n"
        "Purity  >= 99.0 %  99.5 %\n"
        "pH  6.8\n"
        "\n"
        "after blank line is excluded"
    )
    results = extract_test_results(text)
    assert results["Purity"] == {"specification": ">= 99.0 %", "result": "99.5 %"}
    assert results["pH"] == {"specification": "", "result": "6.8"}
    assert "after" not in str(results)
    rows = rows_from_test_results(results)
    assert rows[0]["test"] == "Purity" and rows[1]["test"] == "pH"


def test_table_end_marker_this_lot():
    text = (
        "Parameter  Specification  Result\n"
        "Water  <= 0.5 %  0.33 %\n"
        "This lot conforms.\nShould Not: appear - 1 ppm\n"
    )
    results = extract_test_results(text)
    assert list(results) == ["Water"]


def test_key_value_fallback_pass_fail_and_spec_clearing():
    text = "Identity Test: PASS\nResidue: <10 ppm - 4 ppm\n"
    results = extract_test_results(text)
    assert results["Identity Test"]["result"] == "PASS"
    assert results["Identity Test"]["specification"] == ""
    # verified against the reference: group 3 grabs the FIRST number+unit,
    # and the emptied spec rule (ai:652) clears the specification
    assert results["Residue"] == {"specification": "", "result": "<10 ppm"}


def test_duplicate_test_name_first_seen_order_last_wins():
    text = (
        "Parameter  Specification  Result\n"
        "Purity  >= 99.0 %  99.5 %\n"
        "Water  <= 0.5 %  0.2 %\n"
        "Purity  >= 99.0 %  99.7 %\n"
    )
    rows = rows_from_test_results(extract_test_results(text))
    assert [r["test"] for r in rows] == ["Purity", "Water"]
    assert rows[0]["result"] == "99.7 %"


# --- sections -------------------------------------------------------------------


def test_sds_numbered_sections_positional_slice():
    text = (
        "SAFETY DATA SHEET\n"
        "SECTION 1: Identification\nProduct Name: X\n"
        "SECTION 2: Hazards identification\nH225\n"
    )
    sections = extract_sections(text, "sds")
    assert "section_1" in sections and "section_2" in sections
    assert sections["section_1"]["title"] == "Identification"
    assert sections["section_1"]["content"].startswith("SECTION 1: Identification")
    assert "Product Name: X" in sections["section_1"]["content"]
    assert "Product Name" not in sections["section_2"]["content"]


# --- decode semantics (app.py:416-430, 786-812) -----------------------------------


def test_pdf_direct_page_cap_and_headers():
    pages = [f"page {i} body with enough characters to pass the gate" for i in range(7)]
    text = decode_pdf(pages, None)
    assert "--- Page 1 ---" in text and "--- Page 5 ---" in text
    assert "--- Page 6 ---" not in text  # 5-page cap (app.py:422)


def test_pdf_short_direct_falls_back_to_ocr_two_page_cap():
    text = decode_pdf(["tiny"], ["ocr page one", "ocr page two", "ocr page three"])
    assert text == (
        "--- Page 1 ---\nocr page one\n\n--- Page 2 ---\nocr page two\n\n"
    )


def test_pdf_empty_direct_pages_skipped():
    long = "x" * 120
    text = decode_pdf(["", long, ""], None)
    assert text == f"--- Page 2 ---\n{long}\n\n"


def test_image_decode():
    assert decode_image(["whole-image ocr text"]) == "whole-image ocr text"
    assert decode_image([]) == ""


# --- fingerprint (ai:893-926) -----------------------------------------------------


def test_fingerprint_and_similarity():
    fp = document_fingerprint("Alpha\nBeta\n\nGamma\n")
    assert fp == "AlBeGa_L0"
    assert fingerprint_similarity(fp, fp) == 1.0
    assert fingerprint_similarity("", fp) == 0.0
    assert 0.0 < fingerprint_similarity("AlBeGX_L0", fp) < 1.0


# --- HTML strip (net-new; core/html_strip.py) --------------------------------------


def test_html_strip_drops_boilerplate_keeps_table():
    html = (
        "<html><head><title>T</title><style>x{}</style></head><body>"
        "<nav><a href='/'>Home</a><a href='/p'>Products</a></nav>"
        "<div><h1>Certificate of Analysis</h1><p>Product Name: Acetone</p>"
        "<table><tr><th>Parameter</th><th>Spec</th><th>Result</th></tr>"
        "<tr><td>Purity</td><td>&gt;= 99.0 %</td><td>99.5 %</td></tr></table></div>"
        "<footer>© 2024 Example</footer></body></html>"
    )
    text = strip_html(html)
    assert "Certificate of Analysis" in text
    assert "Product Name: Acetone" in text
    assert "Purity\t>= 99.0 %\t99.5 %" in text  # tab-joined row -> table parser sees columns
    assert "Home" not in text  # nav dropped
    assert "footer" not in text.lower() and "© 2024" not in text
    assert "x{}" not in text  # style dropped
    # stripped HTML classifies and extracts as a COA
    result = process_document(text, EMPTY_CONFIG)
    assert result["document_type"] == "coa"
    assert result["entities"]["test_results"]["Purity"]["result"] == "99.5 %"


def test_html_strip_malformed_never_raises():
    assert strip_html("<div><p>unclosed tags okay") == "unclosed tags okay"
    assert strip_html("ok") == ""  # sub-minimum block (2 chars) dropped
    assert strip_html("") == ""


# --- span-level oracle --------------------------------------------------------------


def test_extract_document_orders_spans_and_normalizes_offsets():
    spans = [
        {"kind": "text", "text": "Batch Number: AB1", "media_ref": None, "offset": 2},
        {"kind": "text", "text": "Certificate of Analysis", "media_ref": None, "offset": 0},
        {"kind": "image", "text": None, "media_ref": "m1", "offset": 1},
    ]
    lookup = lambda ref: ([], ["Lot Number: ZZ9"])
    out = extract_document("d1", spans, lookup, EMPTY_CONFIG)
    kinds = [s["kind"] for s in out["out_spans"]]
    assert kinds == ["text", "image", "text"]
    assert [s["offset"] for s in out["out_spans"]] == [0, 1, 2]
    assert out["out_spans"][1]["text"] == "Lot Number: ZZ9"
    assert out["full_text"].startswith("Certificate of Analysis\n\nLot Number: ZZ9")


# --- offline training (TR1-TR8) -------------------------------------------------------


def test_train_from_field_value_or_combines():
    config = train_from_field_value(
        EMPTY_CONFIG, "coa", "ph_value", "pH Value: 6.8\n", "6.8", NOW
    )
    first = config.field_patterns["coa"]["ph_value"]
    config = train_from_field_value(
        config, "coa", "ph_value", "pH Value = 7.0\n", "7.0", NOW
    )
    combined = config.field_patterns["coa"]["ph_value"]
    # OR-combined with the (?i) hoisted to the front (valid on py>=3.11,
    # unlike the reference's literal (?:(?i)..)|(?:(?i)..) — ai:1100-1104)
    assert combined.startswith("(?i)(?:") and "|(?:" in combined
    assert first.removeprefix("(?i)") in combined
    import re

    re.compile(combined)  # must be a valid pattern
    # trained pattern actually extracts via the second pass
    entities = process_document(
        "Certificate of Analysis\nLot Number: L1\npH Value: 6.8\n", config
    )["entities"]
    assert entities["ph_value"] == "6.8"


def test_auto_train_then_reset_roundtrip():
    # NB: the discovery key class includes \s (hence \n), so the first
    # key-value match glues the title line to "HS Code" — reference quirk
    # (ai:723), preserved: the glued key is trained, bare hs_code is not.
    text = "Certificate of Analysis\nHS Code: 29141100\nLot Number: L1\n" + "x" * 60
    config = auto_train_all_fields(EMPTY_CONFIG, text, "coa", NOW)
    required = config.document_schemas["coa"]["required_fields"]
    assert "certificate_of_analysis\nhs_code" in required
    assert "lot_number" in required
    assert "lot_number" in config.auto_trained_fields["coa"]
    config = reset_document_schema(config, "coa", NOW)
    assert "coa" not in config.document_schemas
    assert config.training_history[-1]["action"] == "reset_schema"


def test_set_field_pattern_and_config_roundtrip(tmp_path):
    config = set_field_pattern(
        EMPTY_CONFIG, "coa", "color", r"(?i)Color\s*[:.]\s*(\w+)", NOW
    )
    path = str(tmp_path / "model_config.json")
    config.save(path)
    loaded = ModelConfig.load(path)
    assert loaded.field_patterns == config.field_patterns
    assert loaded.document_schemas == config.document_schemas


def test_create_context_pattern_matches_reference_shapes():
    text = "Certificate\nHS Code: 29141100\nmore"
    pattern = create_context_pattern(text, "hs_code", "29141100")
    import re

    m = re.search(pattern, text)
    assert m and m.group(1).strip() == "29141100"
