"""Structural document fingerprint + similarity.

Parity targets: /root/reference/ai_document_processor.py:893-926
(``_compute_document_fingerprint``, ``_compute_fingerprint_similarity``)
and the similar-document probe ai:789-818.

The fingerprint doubles as a useful grouping/salting key on the Spark side
(SURVEY.md §2.6 D2).
"""

from __future__ import annotations

from .config import ModelConfig


def document_fingerprint(text: str) -> str:
    """First 2 chars of each of the first 20 non-empty stripped lines,
    concatenated, plus ``_L{len(text)//100}`` (ai:893-908)."""
    short_lines = [
        line.strip()[:50] for line in text.split("\n") if len(line.strip()) > 0
    ][:20]
    return "".join(line[:2] for line in short_lines) + f"_L{len(text) // 100}"


def fingerprint_similarity(fp1: str, fp2: str) -> float:
    """Positional char-match ratio over the shorter prefix (ai:910-926)."""
    if not fp1 or not fp2:
        return 0.0
    min_len = min(len(fp1), len(fp2))
    if min_len == 0:
        return 0.0
    return sum(1 for i in range(min_len) if fp1[i] == fp2[i]) / min_len


def similar_documents(text: str, doc_type: str, config: ModelConfig) -> list[dict]:
    """Transfer-learning probe against stored per-field examples
    (ai:789-818): exact fingerprint match -> similarity 1.0; positional
    ratio > 0.7 -> similarity 0.8."""
    if not text or doc_type not in config.document_examples:
        return []
    current = document_fingerprint(text)
    similar: list[dict] = []
    for field_name, examples in config.document_examples[doc_type].items():
        for example in examples:
            fp = example.get("fingerprint")
            if fp and fp == current:
                similar.append(
                    {"field": field_name, "value": example.get("value"), "similarity": 1.0}
                )
            elif fp and fingerprint_similarity(current, fp) > 0.7:
                similar.append(
                    {"field": field_name, "value": example.get("value"), "similarity": 0.8}
                )
    return similar
