"""gopher_quality_signals: the Gopher Appendix-A1.1 document filters
not covered by repetition_stats, pinned against an independent Python
reference and per-rule trigger documents."""

from __future__ import annotations

import random
import re

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    gopher_quality_signals,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref(texts):
    out = {}
    for d, text in enumerate(texts):
        lines = [l.strip() for l in text.split("\n")]
        lines = [l for l in lines if l != ""]
        counts: dict[str, int] = {}
        for l in lines:
            counts[l] = counts.get(l, 0) + 1
        n_lines = len(lines)
        line_chars = sum(len(l) for l in lines)
        dup_chars = sum((c - 1) * len(l) for l, c in counts.items())
        ell = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
        bul = sum(1 for l in lines if l[:1] in ("-", "*", "•"))

        words = re.split(r"\s+", text.strip())
        n_words = len(words)
        nonws = sum(len(w) for w in words)
        n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
        sym = text.count("#") + text.count("...") + text.count("…")

        mwl = nonws * 1000 // n_words
        swp = sym * 1000 // n_words
        dlc = dup_chars * 1000 // line_chars if line_chars else 0
        elp = ell * 100 // n_lines if n_lines else 0
        blp = bul * 100 // n_lines if n_lines else 0
        awp = n_alpha * 100 // n_words
        bad = int(
            mwl < 3000
            or mwl > 10000
            or swp > 100
            or blp > 90
            or elp > 30
            or awp < 80
        )
        out[d] = (n_lines, n_words, mwl, swp, dlc, elp, blp, awp, bad)
    return out


def _collect(df):
    return {
        r["doc_id"]: (
            r["n_lines"],
            r["n_words"],
            r["mean_word_len_milli"],
            r["symbol_word_permille"],
            r["dup_line_char_permille"],
            r["ellipsis_line_pct"],
            r["bullet_line_pct"],
            r["alpha_word_pct"],
            r["is_gopher_bad"],
        )
        for r in df.collect()
    }


def test_matches_independent_reference_fuzz(spark):
    rng = random.Random(5)
    pieces = (
        ["alpha", "beta", "gamma", "x", "#", "...", "12", "a" * 12, "…"]
        + ["- item", "* star", "• dot", "done...", "so…"]
    )
    texts = []
    for _ in range(25):
        n = rng.randrange(1, 30)
        toks = [rng.choice(pieces) for _ in range(n)]
        # random newline placement builds multi-line docs
        sep = ["\n" if rng.random() < 0.25 else " " for _ in toks]
        texts.append("".join(t + s for t, s in zip(toks, sep)).strip())
    texts += ["word", "a\n\n\na", "-"]
    got = _collect(gopher_quality_signals(_docs_df(spark, texts)))
    assert got == _ref(texts)


def test_each_rule_fires_on_its_trigger_doc(spark):
    texts = [
        "the quick brown fox jumps over the lazy sleeping dog today",  # clean
        "aa bb cc dd ee",  # mean word length 2.0 < 3 -> bad
        "extraordinarily incomprehensible internationalization antidisestablishmentarianism",  # 10.75 avg... wait
        "count # these # symbols # here # now",  # symbol ratio high
        "- one\n- two\n- three\n- four\n- five",  # all bullets
        "first thing...\nsecond thing...\nthird one here",  # 66% ellipsis
        "12 34 56 78 90 12 34 56 78 90",  # no alpha words
        "same line here\nsame line here\nsame line here\nother text line",
    ]
    got = _collect(gopher_quality_signals(_docs_df(spark, texts)))
    want = _ref(texts)
    assert got == want
    assert got[0][-1] == 0  # clean doc passes
    assert got[1][2] < 3000 and got[1][-1] == 1  # short words
    assert got[2][2] > 10000 and got[2][-1] == 1  # long words
    assert got[3][3] > 100 and got[3][-1] == 1  # symbols
    assert got[4][6] == 100 and got[4][-1] == 1  # bullets
    assert got[5][5] > 30 and got[5][-1] == 1  # ellipsis lines
    assert got[6][7] == 0 and got[6][-1] == 1  # alpha words
    # dup-line char fraction is a reported signal (not a verdict rule):
    # 3 of 4 line occurrences are repeats of a 14-char line
    assert got[7][4] == (2 * 14) * 1000 // (3 * 14 + 15)


def test_case_preserving_alpha_and_unicode_ellipsis(spark):
    texts = ["ÉÀÜ ùñî çœ€ xyz", "end…\nstop…"]
    got = _collect(gopher_quality_signals(_docs_df(spark, texts)))
    assert got == _ref(texts)
    # accented-only words carry no ASCII [A-Za-z]: 3 of 4 words fail
    assert got[0][7] == 25
    assert got[1][5] == 100


def test_gopher_rowwise_matches_exploded(spark):
    """The stateless rowwise (streaming) form and the explode+agg
    (batch) form are value-identical — the dispatch parity pin."""
    from coa_ocr_simple_spark.plans.driver_queries_quality import (
        _gopher_raw_rowwise,
        _gopher_verdict,
    )

    rng = random.Random(31)
    pieces = [
        "dup line here", "- bullet", "* star", "tail...", "so…", "word",
        "#tag", "12 34", "a" * 15, "mixed words and.", "",
    ]
    texts = []
    for _ in range(30):
        n = rng.randrange(0, 12)
        texts.append("\n".join(rng.choice(pieces) for _ in range(n)))
    texts += ["", "\n\n", "one two three"]
    df = _docs_df(spark, texts)
    batch = _collect(gopher_quality_signals(df))
    rowwise = _collect(_gopher_verdict(_gopher_raw_rowwise(df)))
    assert batch == rowwise
