"""Media span decode — PDF direct-text, OCR fallback, image OCR.

Reproduces the reference's text-recovery semantics (constants included —
they shape the output text, so they are semantics, not tuning):

- PDF direct text: first 5 pages, non-empty pages joined as
  ``--- Page {n} ---\\n{page}\\n\\n``; accepted only if the stripped result
  exceeds 100 chars (/root/reference/app.py:416-430).
- PDF OCR fallback: rasterize pages 1-2 (dpi=100, grayscale) and OCR each,
  same page-header join (/root/reference/app.py:786-804).
- Image: single OCR pass over the whole image (/root/reference/app.py:809-812).

OCR engines are build-dependent (Tesseract output varies), so the engine
is pluggable (SURVEY.md §4.3.6).  ``DeterministicMediaStore`` is the test
engine: each media_ref resolves to canned per-page direct text and per-page
OCR text (FIXTURES.md §2), making span equality checkable end-to-end.  A
real engine implements the same two methods over stored bytes.
"""

from __future__ import annotations

DIRECT_TEXT_PAGE_CAP = 5  # app.py:422
DIRECT_TEXT_MIN_CHARS = 100  # app.py:427
OCR_PAGE_CAP = 2  # app.py:790, 800
PAGE_HEADER = "--- Page {n} ---\n"  # app.py:425, 803


def join_pages(pages: list[str], cap: int, skip_empty: bool) -> str:
    """Join per-page text with the reference's page headers.

    ``skip_empty`` mirrors app.py:424 (``if page_text:``) on the direct
    path; the OCR path emits a header even for an empty OCR result
    (app.py:802-803 appends unconditionally).
    """
    out = []
    for i, page in enumerate(pages[:cap]):
        if skip_empty and not page:
            continue
        out.append(PAGE_HEADER.format(n=i + 1) + (page or "") + "\n\n")
    return "".join(out)


def decode_pdf(direct_pages: list[str] | None, ocr_pages: list[str] | None) -> str:
    """Cheap-path-first PDF decode (app.py:778-804)."""
    text = join_pages(direct_pages or [], DIRECT_TEXT_PAGE_CAP, skip_empty=True)
    if len(text.strip()) > DIRECT_TEXT_MIN_CHARS:
        return text
    if ocr_pages:
        return join_pages(ocr_pages, OCR_PAGE_CAP, skip_empty=False)
    return ""


def decode_image(ocr_pages: list[str] | None) -> str:
    """Whole-image OCR (app.py:809-812)."""
    return ocr_pages[0] if ocr_pages else ""


def decode_media(kind: str, direct_pages, ocr_pages) -> str:
    if kind == "pdf":
        return decode_pdf(
            list(direct_pages) if direct_pages is not None else None,
            list(ocr_pages) if ocr_pages is not None else None,
        )
    if kind == "image":
        return decode_image(list(ocr_pages) if ocr_pages is not None else None)
    return ""


class OcrEngine:
    """Pluggable OCR engine interface for production media bytes.

    The sandbox has no tesseract/poppler; a real deployment implements
    these with pytesseract + pdf2image at dpi=100/grayscale/2 pages
    (app.py:786-793).  Tests use DeterministicMediaStore instead.
    """

    def pdf_direct_pages(self, blob: bytes) -> list[str]:
        raise NotImplementedError("real PDF text layer decode not bundled in sandbox")

    def pdf_ocr_pages(self, blob: bytes) -> list[str]:
        raise NotImplementedError("real OCR engine not bundled in sandbox")

    def image_text(self, blob: bytes) -> str:
        raise NotImplementedError("real OCR engine not bundled in sandbox")


class DeterministicMediaStore:
    """media_ref -> (direct pages, ocr pages) lookup (test/bench engine)."""

    def __init__(self, records: dict[str, tuple[list[str], list[str]]]):
        self._records = records

    def decode(self, kind: str, media_ref: str) -> str:
        direct, ocr = self._records.get(media_ref, ([], []))
        return decode_media(kind, direct, ocr)
