"""Bigram-LM perplexity filter (CCNet-style) vs an independent Python
reference: integer bits per bigram, unseen-penalty, split/threshold
semantics — plus degenerate-doc behavior."""

from __future__ import annotations

import collections

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _LM_FLUENT_MILLE_MAX,
    _LM_TRAIN_MOD,
    _LM_UNSEEN_BITS,
    lm_perplexity,
)


def _py_lm(rows: list[tuple[int, str]]):
    """Reference implementation written independently of the Spark plan:
    bigram counts from the held-in slice, floor-log2 bits via
    int.bit_length, flat unseen penalty, integer mille-bits."""

    def bigrams(text):
        toks = [w for w in (text or "").strip().lower().split() if w]
        return list(zip(toks, toks[1:]))

    pair_c: collections.Counter = collections.Counter()
    ctx_c: collections.Counter = collections.Counter()
    for doc_id, text in rows:
        if doc_id % 10 == _LM_TRAIN_MOD:
            for a, b in bigrams(text):
                pair_c[(a, b)] += 1
                ctx_c[a] += 1

    out = {}
    for doc_id, text in rows:
        bits = []
        for a, b in bigrams(text):
            c = pair_c.get((a, b))
            if c is None:
                bits.append(_LM_UNSEEN_BITS)
            else:
                bits.append((ctx_c[a] // c).bit_length() - 1)
        n, total = len(bits), sum(bits)
        out[doc_id] = (
            n,
            total,
            (total * 1000 // n) if n else 0,
            bool(n and total * 1000 <= _LM_FLUENT_MILLE_MAX * n),
        )
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in rows],
        "doc_id long, text string, lang string",
    )


def test_lm_perplexity_matches_python_reference(spark):
    import random

    rng = random.Random(11)
    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(60):
        # markov-ish text: mostly chained vocab, some rare words
        words = [rng.choice(vocab) for _ in range(30)]
        if i % 7 == 3:
            words[5:8] = ["rare1", "rare2", "rare3"]
        rows.append((i, " ".join(words)))
    rows += [(60, ""), (61, "solo"), (62, "  spaced\tout  words ")]

    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["total_bits"],
            r["mille_bits"],
            r["is_fluent"],
        )
        for r in lm_perplexity(_df(spark, rows)).collect()
    }
    want = _py_lm(rows)
    assert got == want


def test_lm_perplexity_unseen_penalty_and_gate(spark):
    """A doc sharing no bigram with the reference slice pays the flat
    unseen penalty per bigram and fails the fluency gate; a doc that IS
    the reference text scores low bits and passes."""
    ref = "alpha beta gamma delta " * 20
    rows = [
        (_LM_TRAIN_MOD, ref),  # the held-in slice
        (2, "alpha beta gamma delta alpha beta"),  # fluent under the LM
        (3, "zz qq xx pp zz qq xx pp"),  # fully unseen
        (4, "tiny"),  # no bigrams at all
    ]
    got = {r["doc_id"]: r for r in lm_perplexity(_df(spark, rows)).collect()}

    assert got[3]["total_bits"] == got[3]["n_bigrams"] * _LM_UNSEEN_BITS
    assert not got[3]["is_fluent"]
    assert got[2]["is_fluent"]
    assert got[2]["mille_bits"] < got[3]["mille_bits"]
    assert got[4]["n_bigrams"] == 0 and got[4]["total_bits"] == 0
    assert got[4]["mille_bits"] == 0 and not got[4]["is_fluent"]


def test_ccnet_buckets_are_monotone_terciles(spark):
    """ccnet_ppl_buckets: bucket labels are monotone in mille_bits
    (every head score <= every middle score <= every tail score), the
    cumulative-count boundaries hold exactly (head holds at most n/3
    docs, head+middle at most 2n/3 — value ties spill LATER by
    definition), and equal scores always share a bucket."""
    from coa_ocr_simple_spark.plans.driver_queries_quality import (
        ccnet_ppl_buckets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = ccnet_ppl_buckets(docs).collect()
    spark.catalog.clearCache()
    n = len(rows)
    assert n == docs.count()
    by_bucket = collections.defaultdict(list)
    score_bucket = {}
    for r in rows:
        by_bucket[r["ppl_bucket"]].append(r["mille_bits"])
        prev = score_bucket.setdefault(r["mille_bits"], r["ppl_bucket"])
        assert prev == r["ppl_bucket"]  # ties share a bucket
    assert sorted(by_bucket) == [0, 1, 2]
    assert max(by_bucket[0]) <= min(by_bucket[1])
    assert max(by_bucket[1]) <= min(by_bucket[2])
    assert len(by_bucket[0]) * 3 <= n
    assert (len(by_bucket[0]) + len(by_bucket[1])) * 3 <= 2 * n
