"""Wave-7 operators (driver_queries_mix): block-level exact dedup,
temperature language mixture sampling, deterministic shard export.

DuckDB value parity at sf0.001 is covered by check_oracles /
test_extra_oracles; these tests pin the SEMANTICS on crafted corpora
(planted duplicates, skewed language mix) and the export determinism
that no SQL oracle can express."""

from __future__ import annotations

import hashlib

from coa_ocr_simple_spark.plans.driver_queries_mix import (
    _BLOCK_W,
    _MIX_SCALE,
    _N_SHARDS,
    block_dedup_stats,
    lang_mixture_sample,
    shard_manifest,
    write_sharded,
)


def _words(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# --- block dedup --------------------------------------------------------------------------


def test_block_dedup_finds_planted_boilerplate(spark):
    boiler = _words("b", _BLOCK_W)  # one exact 20-token block
    rows = [
        (1, boiler + " " + _words("x", _BLOCK_W), "en"),  # canonical (first)
        (2, _words("y", _BLOCK_W) + " " + boiler, "en"),  # paste at block 1
        (3, _words("z", 2 * _BLOCK_W), "en"),  # clean
    ]
    out = {
        r["doc_id"]: r
        for r in block_dedup_stats(_docs_df(spark, rows)).collect()
    }
    assert out[1]["n_blocks"] == 2
    # doc 1 holds the canonical occurrence: shared but NOT droppable
    assert out[1]["n_shared_blocks"] == 1
    assert out[1]["n_drop_blocks"] == 0
    # doc 2's copy is the non-canonical occurrence: droppable
    assert out[2]["n_shared_blocks"] == 1
    assert out[2]["n_drop_blocks"] == 1
    assert out[3]["n_shared_blocks"] == 0 and out[3]["n_drop_blocks"] == 0


def test_block_dedup_within_doc_repetition_keeps_first(spark):
    blk = _words("r", _BLOCK_W)
    rows = [(7, " ".join([blk, blk, blk]), "en")]
    out = block_dedup_stats(_docs_df(spark, rows)).collect()[0]
    assert out["n_blocks"] == 3
    assert out["n_shared_blocks"] == 3  # all three occurrences share the hash
    assert out["n_drop_blocks"] == 2  # first kept, two repeats cut


def test_block_dedup_short_doc_emits_no_row(spark):
    rows = [(9, _words("s", _BLOCK_W - 1), "en")]
    assert block_dedup_stats(_docs_df(spark, rows)).count() == 0


def test_block_dedup_randomized_matches_python_reference(spark):
    """Seed-pinned randomized corpus with heavy planted duplication
    (tiny vocab + copied blocks) vs an independent pure-Python
    implementation of the same semantics — exercises within-doc
    repeats, cross-doc shares, and the (doc_id, block_idx) canonical
    tie-break on arbitrary collision patterns."""
    import random

    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(7)]  # tiny vocab -> real block collisions
    docs = []
    for doc_id in range(60):
        n_blocks = rng.randint(0, 4)
        toks: list[str] = []
        for _ in range(n_blocks):
            if docs and rng.random() < 0.4:
                # paste a random full block from an earlier doc
                src_toks = docs[rng.randrange(len(docs))][1].split(" ")
                src_blocks = len(src_toks) // _BLOCK_W
                if src_blocks:
                    b = rng.randrange(src_blocks)
                    toks += src_toks[b * _BLOCK_W : (b + 1) * _BLOCK_W]
                    continue
            toks += [rng.choice(vocab) for _ in range(_BLOCK_W)]
        toks += [rng.choice(vocab) for _ in range(rng.randint(0, _BLOCK_W - 1))]
        docs.append((doc_id, " ".join(toks), "en"))

    # pure-Python reference: same tokenization, same canonical rule
    occs: dict[str, list[tuple[int, int]]] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, text, _ in docs:
        toks = text.lower().strip().split()
        hashes = [
            " ".join(toks[i * _BLOCK_W : (i + 1) * _BLOCK_W])
            for i in range(len(toks) // _BLOCK_W)
        ]
        per_doc[doc_id] = hashes
        for idx, h in enumerate(hashes):
            occs.setdefault(h, []).append((doc_id, idx))
    expected = {}
    for doc_id, hashes in per_doc.items():
        if not hashes:
            continue
        shared = sum(1 for h in hashes if len(occs[h]) > 1)
        drop = sum(
            1
            for idx, h in enumerate(hashes)
            if min(occs[h]) != (doc_id, idx)
        )
        expected[doc_id] = (len(hashes), shared, drop)

    got = {
        r["doc_id"]: (r["n_blocks"], r["n_shared_blocks"], r["n_drop_blocks"])
        for r in block_dedup_stats(_docs_df(spark, docs)).collect()
    }
    assert got == expected
    # the planted duplication must actually fire for the test to mean anything
    assert sum(s for _, s, _ in expected.values()) > 10


# --- language mixture sampling ------------------------------------------------------------


def _py_prefix(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


def test_lang_mixture_matches_independent_reference(spark):
    # skewed mix: 400 en, 25 fr  ->  r_en = sqrt(25/400) = 1/4
    rows = [(i, f"doc {i}", "en") for i in range(400)] + [
        (1000 + i, f"doc {i}", "fr") for i in range(25)
    ]
    kept = {
        r["doc_id"]
        for r in lang_mixture_sample(_docs_df(spark, rows)).collect()
    }
    counts = {"en": 400, "fr": 25}
    n_min = 25
    expected = {
        doc_id
        for doc_id, _, lang in rows
        if _py_prefix(doc_id) ** 2 * counts[lang] < _MIX_SCALE**2 * n_min
    }
    assert kept == expected
    # every doc of the smallest language survives (rate 1.0) ...
    assert all(1000 + i in kept for i in range(25))
    # ... and the head language lands near the 1/4 analytic rate
    n_en = sum(1 for d in kept if d < 1000)
    assert 60 <= n_en <= 140  # 400/4 = 100 ± hash noise


def test_lang_mixture_uniform_corpus_is_identity(spark):
    rows = [(i, "t", ["en", "fr"][i % 2]) for i in range(40)]
    assert lang_mixture_sample(_docs_df(spark, rows)).count() == 40


def test_lang_mixture_alpha75_is_superset_of_alpha50(spark):
    """keep iff p < SCALE * (n_min/n_l)^(1-alpha); the threshold is
    monotone in alpha (r <= 1 so r^(1/4) >= r^(1/2)), so the gentler
    temperature keeps a strict superset per language."""
    rows = [(i, "t", "en") for i in range(400)] + [
        (1000 + i, "t", "fr") for i in range(25)
    ]
    docs = _docs_df(spark, rows)
    k50 = {r["doc_id"] for r in lang_mixture_sample(docs, alpha=0.5).collect()}
    k75 = {r["doc_id"] for r in lang_mixture_sample(docs, alpha=0.75).collect()}
    assert k50 < k75  # strict superset on this skewed corpus
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lang_mixture_sample(docs, alpha=0.9)


# --- shard manifest + deterministic export ------------------------------------------------


def test_shard_manifest_partitions_every_doc_exactly_once(spark):
    rows = [(i, f"text {i}", "en") for i in range(500)]
    m = shard_manifest(_docs_df(spark, rows)).collect()
    assert sum(r["n_docs"] for r in m) == 500
    assert all(0 <= r["shard_id"] < _N_SHARDS for r in m)
    assert all(r["first_key"] <= r["last_key"] for r in m)
    # checksum is the exact sum of 16-bit prefixes, verifiable offline
    by_shard: dict[int, int] = {}
    for i in range(500):
        p = _py_prefix(i)
        by_shard[p % _N_SHARDS] = by_shard.get(p % _N_SHARDS, 0) + p
    assert {r["shard_id"]: r["checksum"] for r in m} == by_shard


def test_write_sharded_is_deterministic_and_matches_manifest(spark, tmp_path):
    rows = [(i, f"text {i}", "en") for i in range(300)]
    docs = _docs_df(spark, rows)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    write_sharded(docs, out_a, n_shards=8)
    write_sharded(docs, out_b, n_shards=8)

    def shard_contents(path):
        # read each shard file alone (no shuffle) so file row order is
        # what toPandas sees — the order a trainer streams
        out = {}
        for s in range(8):
            pdf = (
                spark.read.parquet(f"{path}/shard_id={s}")
                .select("doc_id")
                .toPandas()
            )
            out[s] = list(pdf["doc_id"])
        return out

    a, b = shard_contents(out_a), shard_contents(out_b)
    assert a == b  # deterministic export, within-shard order included
    # within-shard order is the md5 sort key, not insertion order
    for ids in a.values():
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        assert keys == sorted(keys)
    manifest = {
        r["shard_id"]: r["n_docs"]
        for r in shard_manifest(docs, n_shards=8).collect()
    }
    assert {k: len(v) for k, v in a.items() if v} == {
        k: v for k, v in manifest.items()
    }


def test_block_dedup_mega_boilerplate_block(spark):
    """One block hash held by 50% of the corpus (the pervasive-header
    case).  Correctness: every copy except the global first is
    droppable.  Scale note: the join-back on bh concentrates the hot
    hash's occurrences in one shuffle partition; AQE skew-join splits
    that partition at runtime (the firsts side is one row per bh and
    replicates), so the plan has no structural cap to test — this pins
    the semantics under the skew pattern."""
    boiler = _words("mega", _BLOCK_W)
    rows = []
    for i in range(200):
        if i % 2 == 0:
            rows.append((i, boiler + " " + _words(f"u{i}", _BLOCK_W), "en"))
        else:
            rows.append((i, _words(f"v{i}", 2 * _BLOCK_W), "en"))
    out = {
        r["doc_id"]: r
        for r in block_dedup_stats(_docs_df(spark, rows)).collect()
    }
    assert len(out) == 200
    # doc 0 holds the canonical copy; the other 99 holders drop theirs
    assert out[0]["n_drop_blocks"] == 0 and out[0]["n_shared_blocks"] == 1
    for i in range(2, 200, 2):
        assert out[i]["n_drop_blocks"] == 1
        assert out[i]["n_shared_blocks"] == 1
    for i in range(1, 200, 2):
        assert out[i]["n_drop_blocks"] == 0 and out[i]["n_shared_blocks"] == 0


# --- ordered event funnel (extra registry; lives in driver_queries_ext) -------------------


def test_event_funnel_requires_strict_order(spark):
    """A view BEFORE the signup must not advance the funnel, and a
    purchase before the (ordered) view must not either — first-times
    must be strictly increasing, not merely present."""
    import datetime as dt

    from coa_ocr_simple_spark.plans.driver_queries_ext import q_event_funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, typ, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 0.0, "{}")

    rows = [
        # user 1: clean signup(0) -> view(10) -> purchase(20): reached 3
        ev(1, 1, "signup", 0), ev(2, 1, "view", 10), ev(3, 1, "purchase", 20),
        # user 2: view BEFORE signup, none after: reached 1
        ev(4, 2, "view", 0), ev(5, 2, "signup", 10),
        # user 3: purchase sits between signup and view: reached 2
        ev(6, 3, "signup", 0), ev(7, 3, "purchase", 5), ev(8, 3, "view", 10),
        # user 4: no signup at all: no row
        ev(9, 4, "view", 0), ev(10, 4, "purchase", 5),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {
            r["user_id"]: r["reached"]
            for r in q_event_funnel(spark, d).collect()
        }
    assert out == {1: 3, 2: 1, 3: 2}


def test_event_funnel_epoch_is_session_timezone_independent(spark):
    """t1/t2/t3_us must be derived from the NTZ wall clock itself, never
    via cast('timestamp_ltz')+unix_micros — that pair shifts by
    spark.sql.session.timeZone, so the oracle gate would pass only on a
    UTC-default JVM (round-4 advice item)."""
    import datetime as dt
    import tempfile

    from coa_ocr_simple_spark.plans.driver_queries_ext import q_event_funnel

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0, 250000)
    rows = [
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    expect_t1 = int(
        (t0 - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    saved = spark.conf.get("spark.sql.session.timeZone")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        try:
            got = {}
            for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                row = q_event_funnel(spark, d).collect()[0]
                got[tz] = (row["t1_us"], row["t2_us"])
        finally:
            spark.conf.set("spark.sql.session.timeZone", saved)
    assert got["UTC"] == (expect_t1, expect_t1 + 300 * 1_000_000)
    assert len(set(got.values())) == 1, got  # identical under every tz
