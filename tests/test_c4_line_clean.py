"""c4_line_clean: C4 (Raffel et al. 2020, §2.2) line/page heuristics,
pinned against an independent Python reference and per-rule triggers."""

from __future__ import annotations

import random
import re

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _C4_MIN_KEPT_LINES,
    _C4_MIN_LINE_WORDS,
    c4_line_clean,
)


def _ref(texts):
    out = {}
    for d, text in enumerate(texts):
        ls = [l.strip() for l in text.split("\n")]
        ls = [l for l in ls if l != ""]
        kept = [
            l
            for l in ls
            if re.search(r'[.!?"]$', l)
            and len(re.split(r"\s+", l)) >= _C4_MIN_LINE_WORDS
            and "javascript" not in l.lower()
        ]
        dropped = (
            len(kept) < _C4_MIN_KEPT_LINES
            or "lorem ipsum" in text.lower()
            or "{" in text
        )
        out[d] = (
            len(ls),
            len(kept),
            dropped,
            "" if dropped else "\n".join(kept),
        )
    return out


def _collect(df):
    return {
        r["doc_id"]: (
            r["n_lines"],
            r["n_kept"],
            r["is_dropped"],
            r["text_clean"],
        )
        for r in df.collect()
    }


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_independent_reference_fuzz(spark):
    rng = random.Random(13)
    line_pool = (
        ["good solid sentence here."]
        + ["What is this one?", 'He said "stop".', "ends with quote\""]
        + ["no terminal punct", "short.", "two words.", "tiny"]
        + ["enable JavaScript to view this content."]
        + ["another proper line with words!", "  padded line here.  "]
    )
    texts = []
    for _ in range(30):
        n = rng.randrange(0, 14)
        body = "\n".join(rng.choice(line_pool) for _ in range(n))
        if rng.random() < 0.15:
            body += "\nLorem Ipsum dolor sit amet."
        if rng.random() < 0.15:
            body += "\nfunction() { return 1; }"
        texts.append(body)
    texts += ["", "\n\n\n"]
    assert _collect(c4_line_clean(_df(spark, texts))) == _ref(texts)


def test_each_rule_fires(spark):
    five_good = "\n".join(f"this is kept line number {k}." for k in range(5))
    texts = [
        five_good,  # survives intact
        five_good + "\nno terminal punct here",  # line dropped, page kept
        five_good + "\nplease enable javascript now.",  # javascript line cut
        "\n".join(f"kept line {k}." for k in range(4)),  # only 4 -> page drop
        five_good + "\nlorem ipsum dolor.",  # page drop: lorem ipsum
        five_good + "\njson = {a: 1}.",  # page drop: curly brace
        five_good + "\nok.",  # < 3 words -> line dropped, page kept
    ]
    got = _collect(c4_line_clean(_df(spark, texts)))
    assert got == _ref(texts)
    assert not got[0][2] and got[0][3] == five_good
    assert not got[1][2] and got[1][3] == five_good  # bad line removed
    assert not got[2][2] and got[2][3] == five_good
    assert got[3][2] and got[3][3] == ""
    assert got[4][2] and got[4][3] == ""
    assert got[5][2]
    assert not got[6][2] and got[6][3] == five_good
