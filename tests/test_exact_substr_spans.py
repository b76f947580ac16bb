"""exact_substr_spans: stride-1 ExactSubstr duplicated-span detection.

Parity is pinned against an independent Python reference (hashlib md5 +
explicit fold + explicit island merge — no shared code with the plan),
plus hand-constructed boundary cases for the span-merge semantics.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from coa_ocr_simple_spark.plans.driver_queries_mix import (
    _SPAN_B1,
    _SPAN_B2,
    _SPAN_M,
    exact_substr_cut,
    exact_substr_spans,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_spans(texts: list[str], w: int) -> dict[int, tuple[int, int, int]]:
    """Independent reference: {doc_id: (n_spans, dup_tokens, max_span)}."""

    def codes(tok: str) -> tuple[int, int]:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        return int(h[0:8], 16) % _SPAN_M, int(h[8:16], 16) % _SPAN_M

    occ: dict[int, list[tuple[int, int]]] = {}
    for d, text in enumerate(texts):
        toks = re.split(r"\s+", text.strip().lower())
        cs = [codes(t) for t in toks]
        for i in range(len(toks) - w + 1):
            v1 = v2 = 0
            for c1, c2 in cs[i : i + w]:
                v1 = (v1 * _SPAN_B1 + c1) % _SPAN_M
                v2 = (v2 * _SPAN_B2 + c2) % _SPAN_M
            occ.setdefault(v1 * 2**31 + v2, []).append((d, i))

    dup: dict[int, list[int]] = {}
    for positions in occ.values():
        if len(positions) > 1:
            first = min(positions)
            for d, i in positions:
                if (d, i) != first:
                    dup.setdefault(d, []).append(i)

    out = {}
    for d, poss in dup.items():
        spans = []
        for p in sorted(poss):
            if spans and p - spans[-1][1] <= w:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        lens = [e + w - s for s, e in spans]
        out[d] = (len(spans), sum(lens), max(lens))
    return out


def _ref_cut(texts: list[str], w: int) -> dict[int, tuple[str, int, int]]:
    """Independent cut reference: {doc_id: (text_clean, n_kept, n_cut)}.
    Re-derives dup positions like _ref_spans, then drops every token
    covered by any duplicated window [p, p+w)."""

    def codes(tok: str) -> tuple[int, int]:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        return int(h[0:8], 16) % _SPAN_M, int(h[8:16], 16) % _SPAN_M

    toks_by_doc = [re.split(r"\s+", t.strip()) for t in texts]
    occ: dict[int, list[tuple[int, int]]] = {}
    for d, toks in enumerate(toks_by_doc):
        cs = [codes(t.lower()) for t in toks]
        for i in range(len(toks) - w + 1):
            v1 = v2 = 0
            for c1, c2 in cs[i : i + w]:
                v1 = (v1 * _SPAN_B1 + c1) % _SPAN_M
                v2 = (v2 * _SPAN_B2 + c2) % _SPAN_M
            occ.setdefault(v1 * 2**31 + v2, []).append((d, i))

    cut: dict[int, set[int]] = {d: set() for d in range(len(texts))}
    for positions in occ.values():
        if len(positions) > 1:
            first = min(positions)
            for d, i in positions:
                if (d, i) != first:
                    cut[d].update(range(i, i + w))

    out = {}
    for d, toks in enumerate(toks_by_doc):
        kept = [t for i, t in enumerate(toks) if i not in cut[d]]
        out[d] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


def _collect_cut(df) -> dict[int, tuple[str, int, int]]:
    return {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_cut"])
        for r in df.collect()
    }


def _collect(df) -> dict[int, tuple[int, int, int]]:
    return {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["max_span_tokens"])
        for r in df.collect()
    }


def test_matches_independent_reference_fuzz(spark):
    rng = random.Random(42)
    for trial in range(4):
        vocab = [f"t{j}" for j in range(40)]
        texts = []
        for _ in range(8):
            toks = [rng.choice(vocab) for _ in range(rng.randrange(3, 60))]
            texts.append(" ".join(toks))
        # plant a shared 12-token segment in three docs at varied offsets
        seg = [rng.choice(vocab) for _ in range(12)]
        for d in (1, 4, 6):
            t = texts[d].split()
            k = rng.randrange(0, max(1, len(t) - 1))
            texts[d] = " ".join(t[:k] + seg + t[k:])
        want = _ref_spans(texts, 5)
        got = _collect(exact_substr_spans(_docs_df(spark, texts), w=5))
        assert got == want, f"trial {trial}"


def test_keep_first_and_in_doc_repetition(spark):
    base = [f"u{j}" for j in range(10)]
    texts = [
        " ".join(base),  # doc0: the canonical first occurrence
        "x1 x2 " + " ".join(base) + " x3",  # doc1: pasted copy -> all dup
        " ".join(base[:6]) + " y1 y2 y3 y4 y5 y6 " + " ".join(base[:6]),
    ]
    w = 5
    want = _ref_spans(texts, w)
    got = _collect(exact_substr_spans(_docs_df(spark, texts), w=w))
    assert got == want
    assert 0 not in got  # doc0 is the keeper: no duplicated span marked
    # doc1's pasted 10-token copy is ONE maximal span of 10 tokens
    assert got[1] == (1, 10, 10)
    # doc2: BOTH copies of base[:6] duplicate doc0's prefix (and each
    # other), so two separated 6-token spans — the leading copy is not
    # exempt just because it is doc2's own first occurrence; doc0 holds
    # the corpus-wide first.
    assert got[2] == (2, 12, 6)


def test_span_merge_boundary_gap_exactly_w_merges(spark):
    """Two dup windows at positions p and p+w are token-adjacent
    ([p, p+w) and [p+w, p+2w)) and must merge into ONE 2w-token span;
    at p+w+1 a 1-token hole splits them into two spans."""
    A = [f"a{j}" for j in range(5)]
    B = [f"b{j}" for j in range(5)]
    C = [f"c{j}" for j in range(5)]
    # doc1 repeats A+B back-to-back (adjacent) and A..gap..C (holed)
    texts = [
        " ".join(A + ["s1"] + B + ["s2"] + C),  # firsts
        " ".join(A + B) + " z1 " + " ".join(C),
    ]
    w = 5
    got = _collect(exact_substr_spans(_docs_df(spark, texts), w=w))
    assert got == _ref_spans(texts, w)
    # A+B is contiguous 10 dup tokens; C is a separate 5-token span
    assert got[1] == (2, 15, 10)


def test_short_docs_and_no_dup_corpus(spark):
    texts = ["a b c", " ".join(f"q{j}" for j in range(30))]
    assert _collect(exact_substr_spans(_docs_df(spark, texts), w=5)) == {}


def test_cut_matches_independent_reference_fuzz(spark):
    rng = random.Random(7)
    for trial in range(3):
        vocab = [f"W{j}" if j % 3 else f"w{j}" for j in range(30)]  # mixed case
        texts = []
        for _ in range(7):
            toks = [rng.choice(vocab) for _ in range(rng.randrange(3, 50))]
            texts.append(" ".join(toks))
        seg = [rng.choice(vocab) for _ in range(11)]
        for d in (0, 3, 5):
            t = texts[d].split()
            k = rng.randrange(0, max(1, len(t) - 1))
            texts[d] = " ".join(t[:k] + seg + t[k:])
        want = _ref_cut(texts, 5)
        got = _collect_cut(exact_substr_cut(_docs_df(spark, texts), w=5))
        assert got == want, f"trial {trial}"


def test_cut_keeps_first_copy_and_fully_cuts_pure_paste(spark):
    base = [f"u{j}" for j in range(10)]
    texts = [
        " ".join(base),  # doc0: canonical — untouched
        " ".join(base),  # doc1: verbatim repost — fully cut
        "x1 x2 " + " ".join(base) + " x3",  # doc2: paste mid-doc
    ]
    got = _collect_cut(exact_substr_cut(_docs_df(spark, texts), w=5))
    assert got == _ref_cut(texts, 5)
    assert got[0] == (" ".join(base), 10, 0)
    assert got[1] == ("", 0, 10)  # empty-string row still present
    assert got[2] == ("x1 x2 x3", 3, 10)


def test_cut_preserves_case_while_matching_case_insensitively(spark):
    base = ["Alpha", "BETA", "gamma", "Delta", "ePsIlOn"]
    texts = [
        " ".join(base) + " tail0",
        " ".join(t.lower() for t in base) + " Tail1 more2",  # dup only via lower()
    ]
    got = _collect_cut(exact_substr_cut(_docs_df(spark, texts), w=5))
    assert got == _ref_cut(texts, 5)
    # doc1's lowercased copy was detected (case-insensitive hash) but
    # the SURVIVING tokens keep their original case
    assert got[1] == ("Tail1 more2", 2, 5)
    assert got[0][2] == 0


def test_cut_every_doc_gets_a_row_and_counts_tile(spark):
    rng = random.Random(3)
    vocab = [f"t{j}" for j in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for _ in range(12)
    ]
    df = exact_substr_cut(_docs_df(spark, texts), w=4)
    got = _collect_cut(df)
    assert set(got) == set(range(len(texts)))  # no doc dropped
    for d, (clean, n_kept, n_cut) in got.items():
        n = len(texts[d].split())
        assert n_kept + n_cut == n
        assert len(clean.split()) == (n_kept if n_kept else 0)
    assert got == _ref_cut(texts, 4)


def test_default_w_is_fifty(spark):
    toks = [f"v{j}" for j in range(60)]
    texts = [" ".join(toks), " ".join(toks + ["tail1"])]
    got = _collect(exact_substr_spans(_docs_df(spark, texts)))
    assert got == _ref_spans(texts, 50)
    assert got[1][0] >= 1  # the 60-token overlap is caught at w=50
