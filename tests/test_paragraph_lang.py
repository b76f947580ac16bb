"""paragraph_lang_profile: mixture semantics on a synthesized
multi-language corpus (the generic testdata is monolingual, so the
mixed/switch branches need planted docs), plus agreement of the
per-paragraph vote with the doc-level language_quality vote on
single-paragraph docs."""

from __future__ import annotations

from coa_ocr_simple_spark.plans.driver_queries_ext import (
    language_quality,
    paragraph_lang_profile,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EN = "the cat and the dog walk to the house in the morning and it is fine"
DE = "der hund und die katze und das haus von der stadt und nicht schlecht"
FR = "le chat et la maison et les arbres et un jardin des fleurs et le vent"


def test_mixture_profile_semantics(spark):
    rows = [
        (0, EN + "\n\n" + EN + "\n\n" + EN),  # pure en, 3 paragraphs
        (1, EN + "\n\n" + DE + "\n\n" + EN),  # mixed, 2 switches
        (2, DE + "\n\n" + DE + "\n\n" + FR),  # mixed, 1 switch, de dominant
        (3, "zz qq xx"),  # one undecided paragraph
        (4, ""),  # empty doc
        (5, EN + "\n\n\n\n" + EN),  # >2 newlines collapse to one gap
    ]
    got = {
        r["doc_id"]: r
        for r in paragraph_lang_profile(_df(spark, rows)).collect()
    }
    spark.catalog.clearCache()
    assert got[0]["n_paragraphs"] == 3
    assert got[0]["dominant_lang"] == "en"
    assert got[0]["n_lang_switches"] == 0 and got[0]["is_mixed"] == 0

    assert got[1]["is_mixed"] == 1 and got[1]["n_lang_switches"] == 2
    assert got[1]["dominant_lang"] == "en"

    assert got[2]["is_mixed"] == 1 and got[2]["n_lang_switches"] == 1
    assert got[2]["dominant_lang"] == "de"

    assert got[3]["n_paragraphs"] == 1
    assert got[3]["dominant_lang"] == "unknown" and got[3]["is_mixed"] == 0

    assert got[4]["n_paragraphs"] == 0
    assert got[4]["dominant_lang"] == "unknown"

    assert got[5]["n_paragraphs"] == 2 and got[5]["n_lang_switches"] == 0


def test_single_paragraph_vote_agrees_with_doc_level(spark):
    rows = [(0, EN), (1, DE), (2, FR), (3, "zz qq")]
    df = _df(spark, rows)
    para = {
        r["doc_id"]: r["dominant_lang"]
        for r in paragraph_lang_profile(df).collect()
    }
    spark.catalog.clearCache()
    doc = {
        r["doc_id"]: r["lang_guess"] for r in language_quality(df).collect()
    }
    spark.catalog.clearCache()
    assert para == doc


def test_curate_drop_mixed_lang_stage(spark, tmp_path):
    """--drop-mixed-lang: the planted code-switching doc drops; pure
    docs of ANY single language survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coa_ocr_simple_spark.jobs.curate import parse_args, run

    rows = [
        {"doc_id": 0, "text": (EN + "\n\n" + EN)},
        {"doc_id": 1, "text": (DE + "\n\n" + DE)},
        {"doc_id": 2, "text": (EN + "\n\n" + DE + "\n\n" + EN)},  # mixed
        {"doc_id": 3, "text": (FR + "\n\n" + FR)},
    ]
    for r in rows:
        r.update({"lang": "en", "source": "s", "n_chars": len(r["text"])})
    path = str(tmp_path / "mixed_docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    out = str(tmp_path / "curated")
    summary = run(
        parse_args(
            ["--input", path, "--output", out,
             "--jaccard-min", "101",  # isolate the stage
             "--drop-mixed-lang"]
        ),
        spark,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 2 not in kept
    assert {0, 1, 3} <= kept
    assert summary["n_after_mixed_lang"] == len(kept)


def _ref_segments(rows):
    """Independent Python reference for lang_segments: vote per
    non-empty paragraph with the same banks, then collapse runs."""
    import re

    banks = {
        "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "as"},
        "de": {"der", "die", "und", "das", "nicht", "von", "mit", "ist", "den", "ein"},
        "fr": {"le", "la", "les", "et", "des", "un", "une", "est", "pour", "que"},
    }
    out = []
    for doc_id, text in rows:
        paras = [
            (pos, p)
            for pos, p in enumerate(re.split(r"\n{2,}", text))
            if p.strip()
        ]
        segs = []
        for pos, p in paras:
            toks = re.split(r"\s+", p.strip().lower())
            c = {k: sum(t in v for t in toks) for k, v in banks.items()}
            en, de, fr = c["en"], c["de"], c["fr"]
            if en > de and en > fr:
                lang = "en"
            elif de > en and de > fr:
                lang = "de"
            elif fr > en and fr > de:
                lang = "fr"
            else:
                lang = "unknown"
            if segs and segs[-1]["lang"] == lang:
                segs[-1]["n_paras"] += 1
                segs[-1]["n_chars"] += len(p)
                segs[-1]["paras"].append(p)
            else:
                segs.append(
                    {
                        "lang": lang,
                        "para_start": pos,
                        "n_paras": 1,
                        "n_chars": len(p),
                        "paras": [p],
                    }
                )
        for seg_id, s in enumerate(segs):
            out.append(
                (
                    doc_id,
                    seg_id,
                    s["lang"],
                    s["para_start"],
                    s["n_paras"],
                    s["n_chars"],
                    "\n\n".join(s["paras"]),
                )
            )
    return out


def test_lang_segments_against_independent_reference(spark):
    from coa_ocr_simple_spark.plans.driver_queries_ext import (
        lang_segments,
        split_lang_segments,
    )

    rows = [
        (0, EN + "\n\n" + EN + "\n\n" + DE + "\n\n" + DE + "\n\n" + EN),
        (1, EN),  # single segment
        (2, ""),  # vanishes
        (3, DE + "\n\n\n\n" + DE + "\n\n" + "zz qq" + "\n\n" + FR),
        (4, "zz\n\nqq"),  # two empty-vote paragraphs -> ONE unknown run
        (5, FR + "\n\n" + EN + "\n\n" + FR),  # three singleton segments
    ]
    ref = _ref_segments(rows)
    got = sorted(
        (
            r["doc_id"],
            r["seg_id"],
            r["lang"],
            r["para_start"],
            r["n_paras"],
            r["n_chars"],
        )
        for r in lang_segments(_df(spark, rows)).collect()
    )
    spark.catalog.clearCache()
    assert got == sorted(t[:6] for t in ref)

    split = sorted(
        (r["doc_id"], r["seg_id"], r["lang"], r["text"], r["n_chars"])
        for r in split_lang_segments(_df(spark, rows)).collect()
    )
    spark.catalog.clearCache()
    assert split == sorted(
        (d, s, lang, text, len(text)) for d, s, lang, st, np_, nc, text in ref
    )
    # segment invariants: doc 0 has runs en(2) de(2) en(1)
    d0 = [t for t in got if t[0] == 0]
    assert [(t[2], t[4]) for t in d0] == [("en", 2), ("de", 2), ("en", 1)]
    # empty doc contributes nothing
    assert not [t for t in got if t[0] == 2]
