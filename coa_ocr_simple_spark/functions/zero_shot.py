"""Optional zero-shot ML classification fallback (SURVEY.md §2.3 C2).

Reference behavior (/root/reference/ai_document_processor.py:190-231):
when pattern confidence <= 0.8 and transformers is importable, run the HF
zero-shot pipeline ``typeform/distilbert-base-uncased-mnli`` on the first
2000 chars and map the best label to sds/tds/coa/unknown; any exception
falls back to the pattern result.

This path is EXCLUDED from the parity invariant (the reference itself
degrades gracefully when the model is absent, which is exactly the state
of this sandbox — no ``transformers``).  It ships behind
``zero_shot_available()`` and a job flag; the UDF uses the Iterator form
so the model loads once per Python worker, mirroring the reference's lazy
singleton (ai:190-202).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..core.classify import classify

CLASSIFY_INPUT_CAP = 2000  # ai:212
PATTERN_CONFIDENCE_GATE = 0.8  # ai:207
_LABELS = [
    "Safety Data Sheet",
    "Technical Data Sheet",
    "Certificate of Analysis",
    "Unknown Document",
]
_LABEL_TO_TYPE = {
    "Safety Data Sheet": "sds",
    "Technical Data Sheet": "tds",
    "Certificate of Analysis": "coa",
}


def zero_shot_available() -> bool:
    try:
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


_RESULT = StructType(
    [StructField("doc_type", StringType()), StructField("confidence", DoubleType())]
)


def make_zero_shot_classify_udf():
    """text -> (doc_type, confidence) with the ML fallback wired exactly as
    the reference's classify_document: pattern first, ML only under the
    confidence gate, pattern result on any ML failure."""

    @pandas_udf(_RESULT)
    def classify_with_ml(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        classifier = None
        load_failed = False
        for texts in batches:
            rows = []
            for text in texts:
                text = text or ""
                doc_type, confidence = classify(text)
                if confidence <= PATTERN_CONFIDENCE_GATE and text and not load_failed:
                    if classifier is None:
                        try:
                            from transformers import pipeline

                            classifier = pipeline(
                                "zero-shot-classification",
                                model="typeform/distilbert-base-uncased-mnli",
                                device=-1,
                            )
                        except Exception:
                            load_failed = True
                    if classifier is not None:
                        try:
                            out = classifier(text[:CLASSIFY_INPUT_CAP], _LABELS)
                            best = out["labels"][0]
                            doc_type = _LABEL_TO_TYPE.get(best, "unknown")
                            confidence = float(out["scores"][0])
                        except Exception:
                            pass  # keep pattern result (ai:227-229)
                rows.append({"doc_type": doc_type, "confidence": confidence})
            yield pd.DataFrame(rows, columns=["doc_type", "confidence"])

    return classify_with_ml
