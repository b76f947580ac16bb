"""ngram_repetition_stats: the remaining Gopher Appendix-A1.1
repetition filters (top 2-4-gram char fraction, duplicated 5-10-gram
char coverage with overlapping positions counted once), pinned against
an independent Python reference built from sets — not from the Spark
plan's explode/join shape."""

from __future__ import annotations

import random
import re

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _NGRAM_DUP_MAX,
    _NGRAM_DUP_NS,
    _NGRAM_TOP_MAX,
    _NGRAM_TOP_NS,
    ngram_repetition_stats,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref(texts):
    out = {}
    for d, text in enumerate(texts):
        nonws = len(re.sub(r"\s+", "", text))
        toks = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        vals = []
        for n in _NGRAM_TOP_NS:
            grams: dict[tuple, int] = {}
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i : i + n])
                grams[g] = grams.get(g, 0) + 1
            top = max(
                (c * sum(len(w) for w in g) for g, c in grams.items()),
                default=0,
            )
            vals.append(top * 1000 // nonws if nonws else 0)
        for n in _NGRAM_DUP_NS:
            grams = {}
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i : i + n])
                grams[g] = grams.get(g, 0) + 1
            covered: set[int] = set()
            for i in range(len(toks) - n + 1):
                if grams[tuple(toks[i : i + n])] >= 2:
                    covered.update(range(i, i + n))
            chars = sum(len(toks[p]) for p in covered)
            vals.append(chars * 1000 // nonws if nonws else 0)
        names = list(_NGRAM_TOP_NS) + list(_NGRAM_DUP_NS)
        bad = int(
            any(
                v > _NGRAM_TOP_MAX[n]
                for v, n in zip(vals[:3], _NGRAM_TOP_NS)
            )
            or any(
                v > _NGRAM_DUP_MAX[n]
                for v, n in zip(vals[3:], _NGRAM_DUP_NS)
            )
        )
        assert len(vals) == len(names)
        out[d] = tuple(vals) + (bad,)
    return out


def _collect(df):
    cols = (
        [f"top{n}_gram_char_permille" for n in _NGRAM_TOP_NS]
        + [f"dup{n}_gram_char_permille" for n in _NGRAM_DUP_NS]
        + ["is_ngram_repetitive"]
    )
    return {r["doc_id"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_matches_independent_reference_fuzz(spark):
    rng = random.Random(17)
    vocab = ["spam", "ham", "x", "yy", "Words", "the", "of", "zebra"]
    texts = []
    for _ in range(25):
        n = rng.randrange(0, 40)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    # heavy repeaters: exact loops of periods 2..11 exercise every n
    for period in (2, 3, 5, 7, 11):
        base = [rng.choice(vocab) for _ in range(period)]
        texts.append(" ".join(base * 6))
    texts += ["", "   ", "one", "a b"]
    got = _collect(ngram_repetition_stats(_docs_df(spark, texts)))
    assert got == _ref(texts)


def test_overlap_counted_once_and_verdicts(spark):
    # "a b a b a b a b": the 5-gram "a b a b a" occurs at i=0,1,2,3 —
    # dup positions union to ALL 8 tokens (8 chars of 8 nonws = 1000),
    # not 4 occurrences * 5 tokens = 20.
    texts = [
        "a b " * 4,
        "the same pair " * 10,  # top-2/3-gram repetition fires
        # long all-distinct doc: no n-gram repeats, fractions tiny
        " ".join(f"word{i:03d}" for i in range(60)),
    ]
    got = _collect(ngram_repetition_stats(_docs_df(spark, texts)))
    ref = _ref(texts)
    assert got == ref
    assert got[0][3] == 1000  # dup5 coverage saturates, counted once
    assert got[0][-1] == 1
    assert got[1][-1] == 1
    assert got[2][3:9] == (0,) * 6  # no duplicated 5..10-grams
    assert got[2][-1] == 0  # 60 distinct words: clean
