"""HTML main-content extraction (tag-density boilerplate strip).

Net-new surface: the reference never accepts HTML
(/root/reference/app.py:75 allows only png/jpg/jpeg/pdf/tiff), but the
target data model interleaves ``kind='html'`` spans (BASELINE.json
input_hint), so the strip semantics are defined *here*, once, and shared
by the oracle and the Spark UDF (oracle ≡ pipeline by construction —
SURVEY.md §7.3).

Design: a single-pass, stdlib-only (html.parser) block segmenter with a
link-density score per block, in the spirit of the published Boilerpipe /
jusText heuristics:

- drop subtrees of non-content tags (script/style/nav/header/footer/aside/
  noscript/form/iframe/svg/head) and comments;
- segment text into blocks at block-level tags;
- a block is kept iff it has >= MIN_BLOCK_CHARS visible chars and its
  link density (chars under <a> / total chars) <= MAX_LINK_DENSITY;
- table rows are emitted cell-joined with a TAB so the downstream COA
  table parser (core/tables.py, split on ``\\s{2,}|\\t``) sees columns;
- kept blocks join with a single newline.

Fully deterministic; no network, no external parser.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

DROP_TAGS = frozenset(
    "script style nav header footer aside noscript form iframe svg head "
    "template button select option".split()
)
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th blockquote pre section "
    "article main figure figcaption dl dt dd br hr".split()
)
MIN_BLOCK_CHARS = 3
MAX_LINK_DENSITY = 0.5

_WS = re.compile(r"[ \t\r\f\v]+")


class _Block:
    __slots__ = ("chars", "link_chars", "is_row", "cells")

    def __init__(self, is_row: bool = False):
        self.chars: list[str] = []
        self.link_chars = 0
        self.is_row = is_row
        self.cells: list[str] = []

    def text(self) -> str:
        if self.is_row:
            cells = [c for c in (self._clean(c) for c in self.cells) if c]
            return "\t".join(cells)
        return self._clean("".join(self.chars))

    @staticmethod
    def _clean(s: str) -> str:
        return _WS.sub(" ", s).strip()

    def total(self) -> int:
        if self.is_row:
            return len(self.text().replace("\t", ""))
        return len(self.text())


class _ContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._current = _Block()
        self._drop_depth = 0
        self._link_depth = 0
        self._row: _Block | None = None
        self._cell: list[str] | None = None

    # -- block management ----------------------------------------------------
    def _flush(self) -> None:
        if self._current.chars:
            self.blocks.append(self._current)
        self._current = _Block()

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag == "tr":
            self._flush()
            self._row = _Block(is_row=True)
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in ("td", "th") and self._row is not None and self._cell is not None:
            self._row.cells.append("".join(self._cell))
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._row.cells:
                self.blocks.append(self._row)
            self._row = None
        elif tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if self._cell is not None:
            self._cell.append(data)
            if self._link_depth and self._row is not None:
                self._row.link_chars += len(data.strip())
        elif self._row is not None:
            pass  # stray text between cells of a row: ignore
        else:
            self._current.chars.append(data)
            if self._link_depth:
                self._current.link_chars += len(data.strip())

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def strip_html(html: str) -> str:
    """Extract main-content text from an HTML span body (deterministic)."""
    if not html:
        return ""
    parser = _ContentParser()
    try:
        parser.feed(unescape_safe(html))
        parser.close()
    except Exception:
        # malformed markup: degrade to tag-removal, never fail the row
        return _WS.sub(" ", re.sub(r"<[^>]*>", " ", html)).strip()

    kept: list[str] = []
    for block in parser.blocks:
        text = block.text()
        total = block.total()
        if total < MIN_BLOCK_CHARS:
            continue
        if total and block.link_chars / total > MAX_LINK_DENSITY:
            continue
        kept.append(text)
    return "\n".join(kept)


def unescape_safe(html: str) -> str:
    # html.parser with convert_charrefs handles entities inside data; we do
    # NOT pre-unescape (it would corrupt tags).  Kept as an explicit no-op
    # hook so the escaping policy is stated in one place.
    return html


__all__ = ["strip_html"]
