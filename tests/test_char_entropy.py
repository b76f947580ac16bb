"""char_entropy_stats: coarse character-entropy gibberish gate, pinned
against an independent pure-Python integer reference plus the designed
trigger/pass cases (repeated-char spew gates, English prose passes)."""

from __future__ import annotations

from collections import Counter

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _ENT_MIN_BITS_PER_CHAR,
    char_entropy_stats,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _flog2(x: int) -> int:
    return x.bit_length() - 1


def _ref(texts):
    out = {}
    for d, text in enumerate(texts):
        n = len(text)
        if n == 0:
            out[d] = (0, 0, 0, 0, True)
            continue
        counts = Counter(text)
        top = max(counts.values())
        ent = sum(c * _flog2(n // c) for c in counts.values())
        out[d] = (
            n,
            len(counts),
            top * 100 // n,
            ent,
            ent < n * _ENT_MIN_BITS_PER_CHAR,
        )
    return out


TEXTS = [
    "",  # empty -> all zeros, gated
    "a",  # single char: ent 0, gated
    "a" * 5000,  # repeated-char spew: ent 0, gated
    "ab" * 2500,  # two-char alternation: ~1 bit/char coarse, gated
    "abcd" * 1250,  # four-char cycle: exactly 2 bits/char, NOT gated (strict <)
    # real prose clears the 2-bit gate comfortably
    "The Certificate of Analysis confirms the batch met every "
    "specification: purity 99.7%, water content 0.02%, appearance "
    "colourless liquid. Retest date two years from release.\n" * 20,
    "Lot B-1047 was sampled in triplicate and assayed by GC-FID; "
    "all impurities individually below the reporting threshold.",
]


def test_matches_python_reference(spark):
    got = {
        r["doc_id"]: (
            r["n_chars"],
            r["distinct_chars"],
            r["top_char_pct"],
            r["ent_nbits"],
            r["is_low_entropy"],
        )
        for r in char_entropy_stats(_docs_df(spark, TEXTS)).collect()
    }
    assert got == _ref(TEXTS)


def test_rowwise_matches_batch(spark):
    """The stateless streaming form is value-identical to the batch
    explode+agg form on every designed case (incl. empty text)."""
    from coa_ocr_simple_spark.plans.driver_queries_quality import (
        _char_entropy_rowwise,
    )

    docs = _docs_df(spark, TEXTS)
    batch = {tuple(r) for r in char_entropy_stats(docs).collect()}
    rowwise = {tuple(r) for r in _char_entropy_rowwise(docs).collect()}
    assert batch == rowwise


def test_gate_polarity(spark):
    rows = {
        r["doc_id"]: r["is_low_entropy"]
        for r in char_entropy_stats(_docs_df(spark, TEXTS)).collect()
    }
    assert rows[0] and rows[1] and rows[2] and rows[3]  # spew gates
    assert not rows[4]  # exactly 2.0 bits/char sits on the open boundary
    assert not rows[5] and not rows[6]  # prose passes
