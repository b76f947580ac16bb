"""jobs/profile_corpus.py — the tag-then-curate attributes job: every
per-doc signal computed once into a wide table, values identical to the
individual signal frames, rollup consistent, re-runnable output."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.profile_corpus import parse_args, run


def _corpus(tmp_path):
    rng = random.Random(29)
    stop = ["the", "and", "of", "to", "in", "is"]
    vocab = [f"word{j}" for j in range(300)]
    rows = []
    for i in range(18):
        words = [
            rng.choice(stop) if k % 4 == 0 else rng.choice(vocab)
            for k in range(40)
        ]
        rows.append({"doc_id": i, "text": " ".join(words)})
    rows.append({"doc_id": 18, "text": "zz " * 30})  # fails quality + gopher
    rows.append(
        {"doc_id": 19,
         "text": "\n".join(f"- the bullet and item {k}." for k in range(6))}
    )  # all-bullet: gopher-bad but C4-surviving (punctuated 5+ lines)
    for r in rows:
        r.update({"lang": "en", "source": "s", "n_chars": len(r["text"])})
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


def test_profile_all_signals_wide_table(spark, tmp_path):
    from coa_ocr_simple_spark.plans.driver_queries_ext import language_quality
    from coa_ocr_simple_spark.plans.driver_queries_quality import (
        gopher_quality_signals,
    )

    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "attrs")
    report = str(tmp_path / "rollup")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--report", report]
        ),
        spark,
    )
    attrs = spark.read.parquet(out)
    assert summary["n_docs"] == 20 and attrs.count() == 20
    # one row per doc, all six signal families present, no collisions
    for col in (
        "lq_lang_guess", "lq_is_quality", "rep_dup_line_pct",
        "rep_is_repetitive", "gq_mean_word_len_milli", "gq_is_gopher_bad",
        "ng_top2_gram_char_permille", "ng_dup5_gram_char_permille",
        "ng_is_ngram_repetitive",
        "c4_n_kept", "c4_is_dropped", "lm_mille_bits", "lm_is_fluent",
        "dsir_weight_bits", "dsir_is_selected",
        "nb_mille_llr", "nb_is_quality",
        "ent_ent_nbits", "ent_is_low_entropy",
        "ppl_ppl_bucket",
        "enc_n_moji", "enc_n_repl", "enc_n_ctl", "enc_is_clean",
        "nfc_n_before", "nfc_n_after", "nfc_is_changed",
        "plang_n_paragraphs", "plang_dominant_lang", "plang_is_mixed",
    ):
        assert col in attrs.columns, col
    assert "c4_text_clean" not in attrs.columns  # payload stays out
    assert "enc_scrubbed_md5" not in attrs.columns  # attributes only
    assert "nfc_nfc_md5" not in attrs.columns
    assert "ppl_mille_bits" not in attrs.columns  # rides lm_ already

    # values match the standalone signal frames exactly
    docs = spark.read.parquet(docs_path)
    lq = {r["doc_id"]: (r["lang_guess"], r["is_quality"])
          for r in language_quality(docs).collect()}
    gq = {r["doc_id"]: (r["mean_word_len_milli"], r["is_gopher_bad"])
          for r in gopher_quality_signals(docs).collect()}
    got = {r["doc_id"]: r for r in attrs.collect()}
    for d in range(20):
        assert (got[d]["lq_lang_guess"], got[d]["lq_is_quality"]) == lq[d]
        assert (got[d]["gq_mean_word_len_milli"], got[d]["gq_is_gopher_bad"]) == gq[d]

    # the designed trigger docs land as expected
    assert not got[18]["lq_is_quality"] and got[18]["gq_is_gopher_bad"] == 1
    assert got[19]["gq_is_gopher_bad"] == 1 and not got[19]["c4_is_dropped"]
    # "zz zz ..." is a 3-char alphabet: char-entropy gates it; prose passes
    assert got[18]["ent_is_low_entropy"]
    assert not got[0]["ent_is_low_entropy"]
    # ASCII prose: encoding-clean everywhere, NFC is the identity
    assert all(got[d]["enc_is_clean"] == 1 for d in range(20))
    assert all(got[d]["nfc_is_changed"] == 0 for d in range(20))
    assert all(
        got[d]["nfc_n_before"] == got[d]["nfc_n_after"] for d in range(20)
    )
    # perplexity terciles: every label in {0,1,2}, head third bounded
    buckets = [got[d]["ppl_ppl_bucket"] for d in range(20)]
    assert set(buckets) <= {0, 1, 2}
    assert sum(1 for b in buckets if b == 0) * 3 <= 20

    # rollup agrees with the table
    rep = {r["stage"]: r["n_docs"]
           for r in spark.read.parquet(report).collect()}
    assert rep["n_docs"] == 20
    assert rep["n_gq_is_gopher_bad"] == sum(
        1 for d in range(20) if got[d]["gq_is_gopher_bad"] == 1
    )
    assert rep["n_lq_is_quality"] == sum(
        1 for d in range(20) if got[d]["lq_is_quality"]
    )
    # nb trains on the %10==2 slice (docs 2, 12 — both clean prose):
    # one-class labels degrade gracefully to the all-positive skew
    assert rep["n_nb_is_quality"] == sum(
        1 for d in range(20) if got[d]["nb_is_quality"]
    )


def test_profile_signal_subset_and_rerun(spark, tmp_path):
    docs_path = _corpus(tmp_path)
    out = str(tmp_path / "attrs_sub")
    summary = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--signals", "lq,c4"]
        ),
        spark,
    )
    attrs = spark.read.parquet(out)
    assert summary["signals"] == ["lq", "c4"]
    assert "lq_is_quality" in attrs.columns and "c4_n_kept" in attrs.columns
    assert not any(c.startswith(("gq_", "lm_", "dsir_", "rep_"))
                   for c in attrs.columns)
    # overwrite semantics: re-running does not duplicate rows
    summary2 = run(
        parse_args(
            ["--input", docs_path, "--output", out, "--signals", "lq,c4"]
        ),
        spark,
    )
    assert summary2["n_docs"] == 20
    assert spark.read.parquet(out).count() == 20


def test_profile_unknown_signal_raises(spark, tmp_path):
    import pytest

    docs_path = _corpus(tmp_path)
    with pytest.raises(ValueError, match="unknown signals"):
        run(
            parse_args(
                ["--input", docs_path, "--output", str(tmp_path / "x"),
                 "--signals", "lq,nope"]
            ),
            spark,
        )


def test_cluster_signal_joins_kmeans_attributes(spark, tmp_path):
    """--embeddings + the cluster signal: every doc with a matching
    vec_id gets its trained-k-means cluster id and distance, values
    identical to the standalone assignment; requesting the signal
    without --embeddings raises."""
    import pytest
    from pyspark.sql import functions as F

    docs = _corpus(tmp_path)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "attrs_cluster")
    summary = run(
        parse_args(
            [
                "--input", docs,
                "--output", out,
                "--signals", "lq,cluster",
                "--embeddings", emb,
            ]
        ),
        spark,
    )
    assert "cluster" in summary["signals"]
    attrs = spark.read.parquet(out)
    assert "cluster_cluster_id" in attrs.columns
    assert "cluster_d2q" in attrs.columns

    from coa_ocr_simple_spark.jobs.profile_corpus import _cluster_attrs

    ref = {
        r["doc_id"]: (r["cluster_cluster_id"], r["cluster_d2q"])
        for r in _cluster_attrs(spark, emb).collect()
    }
    spark.catalog.clearCache()
    for r in attrs.collect():
        if r["doc_id"] in ref:
            assert (
                r["cluster_cluster_id"], r["cluster_d2q"]
            ) == ref[r["doc_id"]]
        else:
            assert r["cluster_cluster_id"] is None

    with pytest.raises(ValueError, match="requires --embeddings"):
        run(
            parse_args(
                ["--input", docs, "--output", out, "--signals", "cluster"]
            ),
            spark,
        )
    spark.catalog.clearCache()
