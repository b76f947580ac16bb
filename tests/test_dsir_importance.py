"""dsir_importance: DSIR-style hashed n-gram importance weights,
pinned against an independent Python reference (hashlib md5, pure
dict counting) and a discrimination property: docs drawn from the
target slice's vocabulary outscore alien docs."""

from __future__ import annotations

import hashlib
import random

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _DSIR_BUCKETS,
    _DSIR_TARGET_MOD,
    dsir_importance,
)


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % _DSIR_BUCKETS


def _flog2_ratio(a: int, b: int) -> int:
    # floor(log2(a/b)) via the 1024-scaled integer quotient; quotient 0
    # (ratio < 1/1024) clamps to -10, matching bin(0) in both engines
    return max(((a * 1024) // b).bit_length(), 1) - 11


def _ref(rows):
    grams = {}  # doc_id -> list[bucket]
    for doc_id, text in rows:
        t = [w for w in text.strip().lower().split() if w != ""]
        gs = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        grams[doc_id] = [_bucket(g) for g in gs]
    c_t: dict[int, int] = {}
    c_q: dict[int, int] = {}
    for doc_id, bs in grams.items():
        for b in bs:
            c_q[b] = c_q.get(b, 0) + 1
            if doc_id % 10 == _DSIR_TARGET_MOD:
                c_t[b] = c_t.get(b, 0) + 1
    n_t, n_q = sum(c_t.values()), sum(c_q.values())
    B = _DSIR_BUCKETS
    bits = {
        b: _flog2_ratio(c_t.get(b, 0) + 1, c_q[b] + 1)
        + _flog2_ratio(n_q + B, n_t + B)
        for b in c_q
    }
    weights = {d: sum(bits[b] for b in bs) for d, bs in grams.items() if bs}
    n_scored, sum_w = len(weights), sum(weights.values())
    out = {}
    for doc_id, bs in grams.items():
        w = weights.get(doc_id, 0)
        out[doc_id] = (len(bs), w, bool(bs) and w * n_scored > sum_w)
    return out


def _collect(df):
    return {
        r["doc_id"]: (r["n_grams"], r["weight_bits"], r["is_selected"])
        for r in df.collect()
    }


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_matches_independent_reference(spark):
    rng = random.Random(17)
    target_vocab = [f"law{j}" for j in range(40)]
    raw_vocab = [f"web{j}" for j in range(200)]
    rows = []
    for i in range(60):
        vocab = target_vocab if i % 10 == _DSIR_TARGET_MOD else raw_vocab
        # raw pool gets a sprinkle of target vocab so ratios are mixed
        words = [
            rng.choice(target_vocab) if rng.random() < 0.15 else rng.choice(vocab)
            for _ in range(rng.randrange(5, 40))
        ]
        rows.append((i, " ".join(words)))
    rows.append((60, ""))  # gram-free doc: weight 0, not selected
    got = _collect(dsir_importance(_df(spark, rows)))
    want = _ref(rows)
    want[60] = (0, 0, False)
    assert got == want


def test_target_like_docs_outscore_alien_docs(spark):
    rng = random.Random(23)
    target_vocab = [f"med{j}" for j in range(30)]
    alien_vocab = [f"spam{j}" for j in range(30)]
    rows = []
    for i in range(40):
        if i % 10 == _DSIR_TARGET_MOD:
            vocab = target_vocab  # the target slice itself
        elif i % 2 == 0:
            vocab = target_vocab  # raw docs that LOOK like the target
        else:
            vocab = alien_vocab  # raw docs that don't
        rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(25)))
        )
    got = _collect(dsir_importance(_df(spark, rows)))
    raw = [i for i in range(40) if i % 10 != _DSIR_TARGET_MOD]
    target_like = [got[i][1] for i in raw if i % 2 == 0]
    alien = [got[i][1] for i in raw if i % 2 == 1]
    assert min(target_like) > max(alien)
    assert all(got[i][2] for i in raw if i % 2 == 0)
    assert not any(got[i][2] for i in raw if i % 2 == 1)
