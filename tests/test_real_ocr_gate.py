"""Production OCR engine is import-gated and fails loudly in sandboxes."""

import pytest

from coa_ocr_simple_spark.functions.real_ocr import TesseractEngine, ocr_available


def test_real_engine_gated():
    if ocr_available():
        engine = TesseractEngine()
        assert hasattr(engine, "pdf_direct_pages")
    else:
        with pytest.raises(NotImplementedError):
            TesseractEngine()
