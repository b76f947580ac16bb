"""Long-document robustness sweep for the text-scaling operator family.

The O(len^2) hazards this repo has hit (substr byte walks, HOF lambda
re-inlining, InferFiltersFromGenerate expression copies) are INVISIBLE at
the sf0.01 oracle scale and only marginal at sf0.1's 3.6 kB docs — they
bite on the long tail (a 100 TB corpus has million-char documents).  This
sweep times each per-document text operator on synthetic corpora whose
doc length doubles (chars: 20k -> 40k -> 80k, constant doc count) and
flags any operator whose wall grows super-linearly (ratio per doubling
significantly above 2).

Run isolated (same rule as bench.py):
    python scripts/longdoc_sweep.py [--n-docs 64] [--lengths 20000,40000,80000]
Prints one JSON line; append findings to BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORDS = (
    "the batch analysis certificate purity water content appearance result "
    "specification method limit release retest sample test value unit lot "
    "material product quality document section paragraph data table row"
).split()


def _make_text(rng: random.Random, n_chars: int) -> str:
    """Prose-like filler: words, sentence punctuation, line + paragraph
    breaks, and a repeated boilerplate block (so the dedup ops have work)."""
    parts: list[str] = []
    total = 0
    boiler = "this exact boilerplate block repeats verbatim across the document " * 3
    while total < n_chars:
        if rng.random() < 0.1:
            s = boiler
        else:
            s = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(8, 16))) + "."
        if rng.random() < 0.3:
            s += "\n"
        if rng.random() < 0.08:
            s += "\n\n"
        else:
            s += " "
        parts.append(s)
        total += len(s)
    return "".join(parts)[:n_chars]


def build_docs(spark, n_docs: int, n_chars: int):
    rng = random.Random(1234)
    rows = [
        (i, _make_text(rng, n_chars), "en", "synth", n_chars)
        for i in range(n_docs)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(32)


def ops():
    from coa_ocr_simple_spark.plans import (
        driver_queries_corpus as corpus,
        driver_queries_mix as mix,
        driver_queries_quality as q,
    )

    return {
        "gopher_quality_signals": q.gopher_quality_signals,
        "ngram_repetition_stats": q.ngram_repetition_stats,
        "dsir_importance_weights": q.dsir_importance,
        "lm_perplexity": q.lm_perplexity,
        "nb_quality_classifier": q.nb_quality_classifier,
        "char_entropy_stats": q.char_entropy_stats,
        "repetition_stats": q.repetition_stats,
        "paragraph_dedup": mix.paragraph_dedup,
        "exact_substr_spans": mix.exact_substr_spans,
        "exact_substr_cut": mix.exact_substr_cut,
        "block_dedup_stats": mix.block_dedup_stats,
        # second-continuation additions (all built from explode/replace/
        # per-batch UDF shapes that should stay linear)
        "bm25_score": lambda d: corpus.bm25_score(d, corpus.bm25_model(d)),
        "encoding_artifact_stats": corpus.encoding_artifact_stats,
        "nfc_stats": corpus.nfc_stats,
        "ccnet_ppl_buckets": q.ccnet_ppl_buckets,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=64)
    p.add_argument("--lengths", default="20000,40000,80000")
    p.add_argument("--ops", default=None, help="comma-separated subset")
    args = p.parse_args()
    lengths = [int(x) for x in args.lengths.split(",")]

    from bench import make_session

    spark = make_session(32, shuffle_partitions=32)
    table = ops()
    if args.ops:
        table = {k: table[k] for k in args.ops.split(",")}
    results: dict[str, dict[str, float]] = {k: {} for k in table}
    for n_chars in lengths:
        docs = build_docs(spark, args.n_docs, n_chars).persist()
        docs.count()
        for name, fn in table.items():
            spark.catalog.clearCache()
            docs.persist().count()  # keep the corpus itself warm
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
                docs.persist().count()
            results[name][str(n_chars)] = round(best, 3)
        docs.unpersist()
    verdicts = {}
    for name, by_len in results.items():
        rs = [by_len[str(lengths[i + 1])] / max(by_len[str(lengths[i])], 1e-9)
              for i in range(len(lengths) - 1)]
        verdicts[name] = {
            "walls": by_len,
            "growth_per_doubling": [round(r, 2) for r in rs],
            "superlinear": any(r > 3.0 for r in rs),
        }
    print(json.dumps({"n_docs": args.n_docs, "lengths": lengths, "ops": verdicts}))
    spark.stop()


if __name__ == "__main__":
    main()
