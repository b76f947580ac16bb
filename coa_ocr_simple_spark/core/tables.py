"""COA test-results table recovery (layout-line grouping).

Parity target: /root/reference/ai_document_processor.py:575-660
(``_extract_test_results``): locate a Parameter/Spec/Result header, bound
the table by the nearest end marker, split rows on runs of >=2 spaces or
tabs, with a key-value regex fallback when no table is found.

Ordering semantics (SURVEY.md §2.5 T2): results keyed by test name in a
dict — first-seen order, last-wins values (Python >=3.7 guarantee).  The
table boundary exposes them as an ordered list of rows.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .patterns import (
    KEY_VALUE_TEST_PATTERN,
    ROW_SPLIT,
    TABLE_END_MARKERS,
    TABLE_HEADER,
)

TestResult = dict  # {"specification": str, "result": str}


@lru_cache(maxsize=64)
def _rx(pattern: str, flags: int = 0):
    return re.compile(pattern, flags)


def extract_test_results(text: str) -> dict[str, TestResult]:
    results: dict[str, TestResult] = {}

    header = _rx(TABLE_HEADER).search(text)
    if header:
        start = header.start()
        # table end = min over end-marker matches after the header (ai:590-602)
        end = len(text)
        for marker in TABLE_END_MARKERS:
            m = _rx(marker, re.IGNORECASE).search(text[start:])
            if m and start + m.start() < end:
                end = start + m.start()

        body_lines = text[start:end].split("\n")
        for i, line in enumerate(body_lines):
            if i == 0:  # header row
                continue
            if not line.strip():
                continue
            parts = [p.strip() for p in _rx(ROW_SPLIT).split(line.strip()) if p.strip()]
            if len(parts) >= 3:
                results[parts[0]] = {"specification": parts[1], "result": parts[2]}
            elif len(parts) == 2:
                results[parts[0]] = {"specification": "", "result": parts[1]}

    if not results:
        # key-value fallback: "Test Name: [spec -] result|PASS|FAIL|Conforms"
        # (ai:642-658); spec cleared when empty/"-"/== result
        for m in _rx(KEY_VALUE_TEST_PATTERN).finditer(text):
            name = m.group(1).strip()
            spec = m.group(2).strip()
            result = m.group(3).strip()
            if result and (not spec or spec == "-" or spec == result):
                spec = ""
            results[name] = {"specification": spec, "result": result}

    return results


def rows_from_test_results(results: dict[str, TestResult]) -> list[dict]:
    """Table-boundary canonical form: ordered array<struct<test,specification,result>>."""
    return [
        {"test": name, "specification": tr["specification"], "result": tr["result"]}
        for name, tr in results.items()
    ]
