"""paragraph_dedup: CCNet-style corpus-level paragraph dedup pinned
against an independent Python reference (dict-of-sets, not the Spark
plan's agg/join shape), plus hand cases for the canonical-occurrence
rule."""

from __future__ import annotations

import random
import re

from coa_ocr_simple_spark.plans.driver_queries_mix import paragraph_dedup


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref(texts):
    first: dict[str, tuple[int, int]] = {}
    per_doc = {}
    for d, text in enumerate(texts):
        rows = []
        for pos, rawline in enumerate(text.split("\n")):
            line = rawline.strip(" ")
            nrm = re.sub(r"\s+", " ", line.lower())
            if nrm == "":
                continue
            rows.append((pos, line, nrm))
            if nrm not in first or (d, pos) < first[nrm]:
                first[nrm] = (d, pos)
        per_doc[d] = rows
    out = {}
    for d, rows in per_doc.items():
        kept = [(p, l) for p, l, nrm in rows if first[nrm] == (d, p)]
        out[d] = (
            len(rows),
            len(rows) - len(kept),
            "\n".join(l for _, l in sorted(kept)),
        )
    return out


def _collect(df):
    return {
        r["doc_id"]: (r["n_paragraphs"], r["n_dup_paragraphs"], r["clean_text"])
        for r in df.collect()
    }


def test_matches_independent_reference_fuzz(spark):
    rng = random.Random(41)
    paras = [
        "all rights reserved",
        "subscribe to our newsletter",
        "the quick brown fox",
        "Click  HERE   for more",  # whitespace-collapse + case normalization
        "unique sentence %d",
        "",
        "   ",
    ]
    texts = []
    for d in range(40):
        n = rng.randrange(0, 8)
        lines = []
        for _ in range(n):
            p = rng.choice(paras)
            lines.append(p % d if "%d" in p else p)
        texts.append("\n".join(lines))
    texts += ["", "solo paragraph"]
    got = _collect(paragraph_dedup(_docs_df(spark, texts)))
    assert got == _ref(texts)


def test_canonical_occurrence_and_normalization(spark):
    texts = [
        "alpha beta\nshared boilerplate\ngamma",
        "SHARED   boilerplate\nunique two",  # dup after lower + collapse
        "shared boilerplate\nshared boilerplate\nunique three",
    ]
    got = _collect(paragraph_dedup(_docs_df(spark, texts)))
    assert got == _ref(texts)
    # doc 0 owns the canonical occurrence; later docs lose every copy
    assert got[0] == (3, 0, "alpha beta\nshared boilerplate\ngamma")
    assert got[1] == (2, 1, "unique two")
    assert got[2] == (3, 2, "unique three")
