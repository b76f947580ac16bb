"""vocab_coverage_curve: full-row agreement with an independent Python
computation that encodes every doc with the driver-side reference
encoder (plans/bpe.bpe_encode — itself parity-pinned against the
distributed fold), ranks the vocabulary, and reads off the curve at
power-of-two ranks."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

import __spark_entry__ as entrymod
from coa_ocr_simple_spark.plans.bpe import _MAX_BPE_WORD_CHARS, bpe_encode
from coa_ocr_simple_spark.plans.driver_queries_mix import _ENCODE_MERGES

SF = "/root/testdata/sf0.001"


def test_coverage_curve_matches_independent_reference(spark):
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    counts: collections.Counter[str] = collections.Counter()
    cache: dict[str, list[str]] = {}
    for text in texts:
        for w in text.strip().lower().split():
            if not w:
                continue
            if w not in cache:
                cache[w] = (
                    bpe_encode(w, _ENCODE_MERGES)
                    if len(w) <= _MAX_BPE_WORD_CHARS
                    else [w]
                )
            counts.update(cache[w])
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    expected = {}
    cum = 0
    for i, (tok, n) in enumerate(ranked, start=1):
        cum += n
        if (i & (i - 1)) == 0 or i == len(ranked):
            expected[i] = (tok, n, cum, cum * 1000 // total)

    rows = entrymod.extra_queries()["vocab_coverage_curve"](spark, SF).collect()
    spark.catalog.clearCache()
    got = {
        r["vrank"]: (r["token"], r["n_occ"], r["cum_occ"], r["cum_mille"])
        for r in rows
    }
    assert got == expected
    # the curve must end at full coverage
    assert got[len(ranked)][3] == 1000
