"""Leaf module for the cross-engine hex/md5 integer recipes — NO
intra-package imports, so any plans module can import it at the top of
its header without joining the package's import cycle.

Why this module exists: the plans modules form a genuine import cycle
(quality -> dedup -> [registry build] -> mix -> quality), which is fine
as long as everything a partially-initialized module must serve during
the cycle is defined BEFORE its own intra-package imports.  These hash
helpers are exactly that class of symbol — tiny, dependency-free, and
needed by registry builds mid-cycle — so they live here, outside the
cycle entirely (the cms_stream/quality-first import failures that
motivated this are documented in CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_HEXS = "0123456789abcdef"


def _md5_prefix_val(col):
    """Value of the first 4 hex digits of md5(col) as an integer in
    [0, 65536) — built from instr positions in the hex alphabet, the
    repo's cross-engine recipe (DuckDB has no hex->int cast)."""
    h = F.md5(col.cast("string"))
    v = F.lit(0)
    for i in range(4):
        v = v * 16 + (F.instr(F.lit(_HEXS), F.substring(h, i + 1, 1)) - 1)
    return v


def _md5_prefix_sql(expr: str) -> str:
    """SQL twin of _md5_prefix_val over an already-md5'd string expr."""
    terms = [
        f"(instr('{_HEXS}', substring({expr}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def _hex_int_val(h, start: int, nd: int):
    """Integer value of nd hex digits of an md5 string starting at
    1-based `start` — the _md5_prefix_val recipe widened to long."""
    v = F.lit(0).cast("long")
    for i in range(nd):
        v = v * 16 + (F.instr(F.lit(_HEXS), F.substring(h, start + i, 1)) - 1)
    return v


def _hex_int_sql(expr: str, start: int, nd: int) -> str:
    terms = [
        f"CAST(instr('{_HEXS}', substring({expr}, {start + i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (nd - 1 - i)}"
        for i in range(nd)
    ]
    return "(" + " + ".join(terms) + ")"
