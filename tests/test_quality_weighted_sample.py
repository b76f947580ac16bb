"""Quality-weighted (DCLM-style) soft sampling: deterministic-coin
parity vs an independent Python reference, ramp boundary behavior, and
the curate-job --quality-sample stage."""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _NB_SPAM_MOD,
    _NB_SPAM_RES,
    _QWS_HI,
    _QWS_LO,
    _QWS_W,
    q_nb_quality_classifier,
    q_quality_weighted_sample,
)

SF = "/root/testdata/sf0.001"


def test_qws_matches_independent_coin(spark):
    """Every row's verdict and p64k reproduce from the doc's mille_llr
    and an independently computed md5-prefix coin — the sampler adds
    nothing non-deterministic on top of the classifier scores."""
    verdicts = {
        r["doc_id"]: r["mille_llr"]
        for r in q_nb_quality_classifier(spark, SF).collect()
    }
    got = q_quality_weighted_sample(spark, SF).collect()
    assert len(got) == len(verdicts)
    for r in got:
        m = verdicts[r["doc_id"]]
        assert r["mille_llr"] == m
        prefix = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16
        )
        assert r["is_kept"] == (prefix * _QWS_W < (m - _QWS_LO) * 65536)
        # ramp is non-negative, so Python // == truncating DIV here
        assert r["p64k"] == min(max(m - _QWS_LO, 0), _QWS_W) * 65536 // _QWS_W


def test_qws_ramp_boundaries_and_class_rates(spark):
    """Docs at/above the HI knee always ship; at/below LO never; the
    synthesized spam class survives at a real but heavily reduced rate
    vs the clean class (the soft-sampling point: downweight, not
    erase)."""
    rows = q_quality_weighted_sample(spark, SF).collect()
    hi = [r for r in rows if r["mille_llr"] >= _QWS_HI]
    lo = [r for r in rows if r["mille_llr"] <= _QWS_LO]
    assert hi and all(r["is_kept"] for r in hi)
    assert all(not r["is_kept"] for r in lo)

    spam = [r for r in rows if r["doc_id"] % _NB_SPAM_MOD == _NB_SPAM_RES]
    clean = [r for r in rows if r["doc_id"] % _NB_SPAM_MOD != _NB_SPAM_RES]

    def rate(rs):
        return sum(r["is_kept"] for r in rs) / len(rs)

    assert rate(spam) < 0.5 < rate(clean)
    assert any(r["is_kept"] for r in spam)  # downweighted, not erased


def test_curate_quality_sample_stage(spark, tmp_path):
    """--quality-sample: soft sampling over the survivors — clean docs
    ship near-wholesale, spam docs are cut to a minority, and the stage
    count matches what lands on disk."""
    from coa_ocr_simple_spark.jobs.curate import parse_args, run

    rng = random.Random(31)
    stop = ["the", "and", "of", "to", "in", "is"]
    vocab = [f"word{j}" for j in range(400)]
    rows = []
    for i in range(60):
        words = [
            rng.choice(stop) if k % 4 == 0 else rng.choice(vocab)
            for k in range(60)
        ]
        text = " ".join(words)
        if i % 4 == 2:  # spam residue intersects the %10==2 train slice
            text += " ###..." * 30
        rows.append({"doc_id": i, "text": text})
    for r in rows:
        r.update({"lang": "en", "source": "s", "n_chars": len(r["text"])})
    path = str(tmp_path / "qws_docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)

    out = str(tmp_path / "qws_out")
    summary = run(
        parse_args(
            ["--input", path, "--output", out,
             "--jaccard-min", "101",  # disable near-dup for isolation
             "--quality-sample"]
        ),
        spark,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert summary["n_after_quality_sample"] == len(kept)
    clean = {i for i in range(60) if i % 4 != 2}
    spam = set(range(60)) - clean
    assert len(kept & clean) / len(clean) > 0.9
    assert len(kept & spam) / len(spam) < 0.5
