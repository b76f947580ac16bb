"""train_quality job: model artifact round-trip, label-split summary,
corpus scoring, and composition with the streaming scorer."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.train_quality import parse_args, run
from coa_ocr_simple_spark.plans.driver_queries_quality import _DSIR_BUCKETS


def _corpus(tmp_path):
    rng = random.Random(7)
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
        rows.append({"doc_id": i, "text": text, "lang": "en", "source": "s",
                     "n_chars": len(text)})
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


def test_train_quality_writes_model_and_scores(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    model = str(tmp_path / "nb_model")
    scores = str(tmp_path / "verdicts")
    summary = run(
        parse_args(
            ["--input", docs_path, "--model", model, "--scores", scores]
        ),
        spark,
    )
    # the %10==2 slice is doc_ids 2,12,22,32,42,52 — spam at %4==2
    # intersects it at 2,22,42: a 3/3 label split
    assert summary["n_train"] == 6
    assert summary["n_train_pos"] == 3 and summary["n_train_neg"] == 3
    assert summary["n_model_buckets"] == _DSIR_BUCKETS
    assert summary["n_scored"] == 60
    # the classifier separates the classes on the full corpus
    got = {r["doc_id"]: r["is_quality"]
           for r in spark.read.parquet(scores).collect()}
    assert all(got[i] for i in range(60) if i % 4 != 2)
    assert not any(got[i] for i in range(60) if i % 4 == 2)
    assert summary["n_quality"] == 45

    # re-run overwrites, not duplicates
    summary2 = run(
        parse_args(["--input", docs_path, "--model", model]), spark
    )
    assert spark.read.parquet(model).count() == _DSIR_BUCKETS
    assert summary2["thr2"] == summary["thr2"]


def test_cli_model_feeds_streaming_scorer(spark, tmp_path):
    from coa_ocr_simple_spark.streaming.nb_quality_stream import (
        run_streaming_nb_quality,
    )

    docs_path = _corpus(tmp_path)
    model = str(tmp_path / "nb_model")
    run(parse_args(["--input", docs_path, "--model", model]), spark)

    inp = tmp_path / "stream_in"
    inp.mkdir()
    # the unnormalized-llr threshold is calibrated on train-sized docs,
    # so the streamed docs mirror the train shape (~60-90 grams)
    clean_text = " ".join(
        ["the", "and", "of"][k % 3] if k % 4 == 0 else f"word{k % 40}"
        for k in range(60)
    )
    spam_text = clean_text + " ###..." * 30
    rows = [
        {"doc_id": 100, "text": clean_text, "lang": "en",
         "source": "s", "n_chars": len(clean_text)},
        {"doc_id": 101, "text": spam_text,
         "lang": "en", "source": "s", "n_chars": len(spam_text)},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(inp / "b1.parquet"))
    out = str(tmp_path / "scores_out")
    run_streaming_nb_quality(
        spark, str(inp), model, out, str(tmp_path / "ckpt")
    )
    got = {r["doc_id"]: r["is_quality"]
           for r in spark.read.parquet(out).collect()}
    assert got[100] and not got[101]
