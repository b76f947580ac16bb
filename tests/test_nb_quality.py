"""Naive-Bayes quality classifier vs an independent Python reference
(hashing, counts, floor-log2 bits, trained threshold), held-out
discrimination on the synthesized corpus, and the curate-job stage."""

from __future__ import annotations

import collections
import hashlib
import re

import pyarrow.parquet as papq
from pyspark.sql import functions as F

from coa_ocr_simple_spark.plans.driver_queries_quality import (
    _DSIR_BUCKETS,
    _NB_SPAM,
    _NB_SPAM_MOD,
    _NB_SPAM_RES,
    _NB_TRAIN_MOD,
    _nb_docs,
    gopher_quality_signals,
    nb_classifier_verdicts,
    q_nb_quality_classifier,
)

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV / DuckDB // semantics;
    Python // floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _py_nb(rows: list[dict]):
    """Reference implementation written independently of the Spark
    plan: spam synthesis, md5-prefix feature hashing, per-class Laplace
    counts, bit_length floor-log2 scoring, train-midpoint threshold.
    Labels use the construction identity (clean <=> not the spam
    residue), which test_gopher_labels_match_construction pins against
    the Spark-side Gopher verdict."""
    B = _DSIR_BUCKETS

    def text_of(r):
        t = r["text"]
        if r["doc_id"] % _NB_SPAM_MOD == _NB_SPAM_RES:
            t = t + _NB_SPAM * (r["n_chars"] // 20)
        return t

    def grams(text):
        toks = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        gs = list(toks)
        gs += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:4], 16) % B
            for g in gs
        ]

    c_pos: collections.Counter = collections.Counter()
    c_neg: collections.Counter = collections.Counter()
    for r in rows:
        if r["doc_id"] % 10 == _NB_TRAIN_MOD:
            c = (
                c_pos
                if r["doc_id"] % _NB_SPAM_MOD != _NB_SPAM_RES
                else c_neg
            )
            for b in grams(text_of(r)):
                c[b] += 1
    s_pos, s_neg = sum(c_pos.values()), sum(c_neg.values())

    def bits(b):
        qp = ((s_pos + B) * 1024) // (c_pos.get(b, 0) + 1)
        qn = ((s_neg + B) * 1024) // (c_neg.get(b, 0) + 1)
        return qn.bit_length() - qp.bit_length()

    llr = {}
    for r in rows:
        gs = grams(text_of(r))
        llr[r["doc_id"]] = (len(gs), sum(bits(b) for b in gs))

    sp = sn = np = nn = 0
    for r in rows:
        if r["doc_id"] % 10 == _NB_TRAIN_MOD:
            n, w = llr[r["doc_id"]]
            if r["doc_id"] % _NB_SPAM_MOD != _NB_SPAM_RES:
                sp, np = sp + w, np + 1
            else:
                sn, nn = sn + w, nn + 1
    thr2 = 0 if np == 0 or nn == 0 else _tdiv(sp, np) + _tdiv(sn, nn)

    out = {}
    for r in rows:
        n, w = llr[r["doc_id"]]
        out[r["doc_id"]] = (
            n,
            w,
            _tdiv(w * 1000, n) if n else 0,
            w * 2 > thr2,
        )
    return out


def test_nb_matches_python_reference(spark):
    rows = papq.read_table(f"{SF}/documents.parquet").to_pylist()
    want = _py_nb(rows)
    got = q_nb_quality_classifier(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        assert (
            r["n_grams"],
            r["llr_bits"],
            r["mille_llr"],
            r["is_quality"],
        ) == want[r["doc_id"]], r["doc_id"]


def test_gopher_labels_match_construction(spark):
    """The training labels the query derives from the Gopher verdict
    equal the construction identity (spam residue <=> gopher-bad) on
    the synthesized train slice — the assumption _py_nb builds on."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = _nb_docs(docs).where(F.col("doc_id") % 10 == _NB_TRAIN_MOD)
    for r in gopher_quality_signals(train).collect():
        assert (r["is_gopher_bad"] == 1) == (
            r["doc_id"] % _NB_SPAM_MOD == _NB_SPAM_RES
        ), r["doc_id"]


def test_nb_held_out_discrimination(spark):
    """The classifier genuinely separates the synthesized classes on
    docs it never trained on: >= 90 % held-out accuracy and BOTH
    verdict values present (the degenerate all-true first cut is what
    this guards against)."""
    nb = q_nb_quality_classifier(spark, SF)
    held = nb.where(F.col("doc_id") % 10 != _NB_TRAIN_MOD)
    r = held.select(
        F.count("*").alias("n"),
        F.sum(
            (
                F.col("is_quality")
                == (F.col("doc_id") % _NB_SPAM_MOD != _NB_SPAM_RES)
            ).cast("int")
        ).alias("correct"),
        F.sum(F.col("is_quality").cast("int")).alias("n_pos"),
    ).collect()[0]
    assert r["correct"] * 10 >= r["n"] * 9, (r["correct"], r["n"])
    assert 0 < r["n_pos"] < r["n"]


def test_nb_model_roundtrips_through_parquet(spark, tmp_path):
    """nb_model written to parquet and re-read scores identically to
    the direct composition — the model really is a serializable
    artifact (what the streaming scorer consumes)."""
    from coa_ocr_simple_spark.plans.driver_queries_quality import (
        nb_model,
        nb_score,
    )

    docs = _nb_docs(spark.read.parquet(f"{SF}/documents.parquet"))
    train = docs.where(F.col("doc_id") % 10 == _NB_TRAIN_MOD)
    lab = gopher_quality_signals(train).select(
        "doc_id",
        (F.col("is_gopher_bad") == 0).cast("long").alias("is_pos"),
    )
    mp = str(tmp_path / "nb_model.parquet")
    model = nb_model(train, lab)
    assert model.count() == _DSIR_BUCKETS  # complete over the domain
    model.write.parquet(mp)
    direct = {
        r["doc_id"]: r for r in nb_classifier_verdicts(docs, train, lab).collect()
    }
    via_disk = nb_score(docs, spark.read.parquet(mp)).collect()
    assert len(via_disk) == len(direct)
    for r in via_disk:
        d = direct[r["doc_id"]]
        assert (r["n_grams"], r["llr_bits"], r["mille_llr"], r["is_quality"]) == (
            d["n_grams"], d["llr_bits"], d["mille_llr"], d["is_quality"]
        )


def _stream_doc_rows(rows):
    return [
        {"doc_id": i, "text": t, "lang": "en", "source": "s",
         "n_chars": len(t)}
        for i, t in rows
    ]


def test_nb_stream_scores_and_resumes(spark, tmp_path):
    """Stream-static NB scoring: docs scored incrementally against a
    parquet model trained offline; verdicts separate the classes, and a
    checkpoint restart processes only new files."""
    import pyarrow as pa
    import pyarrow.parquet as papq_w

    from coa_ocr_simple_spark.plans.driver_queries_quality import nb_model
    from coa_ocr_simple_spark.streaming.nb_quality_stream import (
        run_streaming_nb_quality,
    )

    clean = "alpha beta gamma delta epsilon zeta " * 10
    spam = "alpha beta gamma " + "###... " * 40
    train_rows = _stream_doc_rows(
        [(100 + i, clean) for i in range(3)]
        + [(200 + i, spam) for i in range(3)]
    )
    tp = str(tmp_path / "train.parquet")
    papq_w.write_table(pa.Table.from_pylist(train_rows), tp)
    train = spark.read.parquet(tp)
    lab = train.select(
        "doc_id", (F.col("doc_id") < 200).cast("long").alias("is_pos")
    )
    mp = str(tmp_path / "model.parquet")
    nb_model(train, lab).write.parquet(mp)

    inp = tmp_path / "docs"
    inp.mkdir()
    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")

    papq_w.write_table(
        pa.Table.from_pylist(
            _stream_doc_rows(
                [(1, "beta gamma delta epsilon beta gamma"),
                 (2, "delta epsilon ###... ###... ###... ###...")]
            )
        ),
        str(inp / "b1.parquet"),
    )
    run_streaming_nb_quality(spark, str(inp), mp, out, ckpt)
    first = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {1, 2}  # EVERY doc is scored, not just flagged
    assert first[1]["is_quality"] and not first[2]["is_quality"]

    # restart: only the new file is processed; batch dirs accumulate
    papq_w.write_table(
        pa.Table.from_pylist(
            _stream_doc_rows([(3, "zeta alpha beta gamma delta")])
        ),
        str(inp / "b2.parquet"),
    )
    run_streaming_nb_quality(spark, str(inp), mp, out, ckpt)
    final = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(final) == {1, 2, 3}
    assert final[3]["is_quality"]
    batches = {
        r["batch"] for r in spark.read.parquet(out).select("batch").collect()
    }
    assert len(batches) == 2


def test_nb_one_class_labels_degrade_gracefully(spark):
    """With one-class labels the threshold falls back to 0 and the
    verdicts skew positive — no crash, no all-negative inversion."""
    docs = spark.createDataFrame(
        [(i, "plain common words here again and again") for i in range(30)],
        "doc_id long, text string",
    )
    train = docs.where(F.col("doc_id") % 10 == _NB_TRAIN_MOD)
    lab = train.select("doc_id", F.lit(1).cast("long").alias("is_pos"))
    out = nb_classifier_verdicts(docs, train, lab)
    assert out.where(~F.col("is_quality")).count() == 0
