"""Conditional REAL-engine decode tests (reference app.py:786-812).

Runs only where the production OCR stack (pypdf/PyPDF2 + pdf2image +
pytesseract) is importable — skipped in this sandbox, runnable on a real
deployment image.  Asserts the page-cap / page-header / acceptance-gate
semantics of core.decode against actual TesseractEngine output, so the
engine-independence claim (SURVEY §4.3.6) is exercised with real bytes,
not only the DeterministicMediaStore."""

from __future__ import annotations

import pytest

from coa_ocr_simple_spark.core.decode import (
    DIRECT_TEXT_MIN_CHARS,
    DIRECT_TEXT_PAGE_CAP,
    decode_media,
)
from coa_ocr_simple_spark.functions.real_ocr import TesseractEngine, ocr_available

pytestmark = pytest.mark.skipif(
    not ocr_available(),
    reason="production OCR stack (pypdf/pdf2image/pytesseract) not installed",
)


def _build_pdf(pages: list[str]) -> bytes:
    """Hand-assembled minimal PDF with one Helvetica text line per page —
    no writer library needed, parseable by any conforming reader."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objs: list[bytes] = []  # 1-indexed object bodies, in object-number order
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        stream = f"BT /F1 12 Tf 72 720 Td ({esc(text)}) Tj ET".encode()
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def test_direct_text_page_cap_and_headers():
    """6-page PDF with a rich text layer: direct path accepted, capped at
    DIRECT_TEXT_PAGE_CAP pages with the reference's page headers
    (app.py:416-430)."""
    page_text = "Certificate of Analysis sample page with plenty of text"
    blob = _build_pdf([f"{page_text} number {i}" for i in range(1, 7)])
    engine = TesseractEngine()
    direct = engine.pdf_direct_pages(blob)
    assert len(direct) == 6
    assert page_text.split()[0] in direct[0]

    decoded = decode_media("pdf", direct, ["OCR-FALLBACK"])
    assert len(decoded.strip()) > DIRECT_TEXT_MIN_CHARS
    assert "--- Page 1 ---" in decoded
    assert f"--- Page {DIRECT_TEXT_PAGE_CAP} ---" in decoded
    assert f"--- Page {DIRECT_TEXT_PAGE_CAP + 1} ---" not in decoded
    assert "OCR-FALLBACK" not in decoded  # cheap path won


def test_short_direct_text_falls_back_to_ocr():
    """A PDF whose text layer is under the 100-char acceptance gate must
    take the OCR fallback (app.py:778-804), OCR page cap 2."""
    import pytesseract

    try:
        pytesseract.get_tesseract_version()
    except Exception:
        pytest.skip("tesseract binary not installed")

    blob = _build_pdf(["tiny"])
    engine = TesseractEngine()
    direct = engine.pdf_direct_pages(blob)
    assert len("".join(direct).strip()) <= DIRECT_TEXT_MIN_CHARS
    ocr = engine.pdf_ocr_pages(blob)  # needs poppler; real raster + OCR
    decoded = decode_media("pdf", direct, ocr)
    assert decoded == "" or decoded.startswith("--- Page 1 ---")


def test_image_ocr_contract():
    """Image path: whole-image OCR string passes through decode_media
    unchanged (app.py:809-812)."""
    import io

    import pytesseract
    from PIL import Image

    try:
        pytesseract.get_tesseract_version()
    except Exception:
        pytest.skip("tesseract binary not installed")

    buf = io.BytesIO()
    Image.new("L", (120, 40), color=255).save(buf, format="PNG")
    engine = TesseractEngine()
    text = engine.image_text(buf.getvalue())
    assert isinstance(text, str)
    assert decode_media("image", None, [text]) == text
