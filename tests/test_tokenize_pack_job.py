"""jobs/tokenize_pack.py — the tokenize -> pack tail: real BPE token
counts drive the boundary-aware packer, in both input modes."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs import tokenize_pack, train_bpe
from coa_ocr_simple_spark.plans.driver_queries_quality import _PACK_BIN_TOKENS


def _corpus(tmp_path, n=30):
    rows = [
        {"doc_id": i, "text": "pack pack packing packed " * 40,
         "lang": "en", "source": "s", "n_chars": 100}
        for i in range(n)
    ]
    path = str(tmp_path / "tp_docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


def _check_fragments(spark, frag_path, expect_docs):
    frags = spark.read.parquet(frag_path).collect()
    assert {r["doc_id"] for r in frags} == set(range(expect_docs))
    by_bin: dict[int, int] = {}
    for r in frags:
        assert r["bin_offset"] + r["frag_len"] <= _PACK_BIN_TOKENS
        by_bin[r["bin_id"]] = by_bin.get(r["bin_id"], 0) + r["frag_len"]
    last = max(by_bin)
    for b, n in by_bin.items():
        assert n == _PACK_BIN_TOKENS or b == last
    return sum(r["frag_len"] for r in frags)


def test_tokenize_pack_from_encoded_input(spark, tmp_path):
    docs = _corpus(tmp_path)
    merges_out = str(tmp_path / "tp_merges")
    enc_out = str(tmp_path / "tp_encoded")
    train_bpe.main  # job module imported above; run via run()
    train_bpe.run(
        train_bpe.parse_args(
            ["--input", docs, "--output", merges_out,
             "--n-merges", "6", "--encode-output", enc_out]
        ),
        spark,
    )
    frag_out = str(tmp_path / "tp_frags")
    summary = tokenize_pack.run(
        tokenize_pack.parse_args(
            ["--encoded-input", enc_out, "--output", frag_out]
        ),
        spark,
    )
    total = _check_fragments(spark, frag_out, 30)
    assert summary["n_tokens_total"] == total
    assert summary["n_docs"] == 30
    # BPE compresses the repeated words: fewer tokens than characters,
    # more than whitespace words
    enc = spark.read.parquet(enc_out).collect()
    assert summary["n_tokens_total"] == sum(r["n_tokens"] for r in enc)


def test_tokenize_pack_on_the_fly_matches_encoded_mode(spark, tmp_path):
    docs = _corpus(tmp_path, n=10)
    merges_out = str(tmp_path / "fly_merges")
    enc_out = str(tmp_path / "fly_encoded")
    train_bpe.run(
        train_bpe.parse_args(
            ["--input", docs, "--output", merges_out,
             "--n-merges", "6", "--encode-output", enc_out]
        ),
        spark,
    )
    out_a = str(tmp_path / "fly_frags_a")
    out_b = str(tmp_path / "fly_frags_b")
    sa = tokenize_pack.run(
        tokenize_pack.parse_args(
            ["--encoded-input", enc_out, "--output", out_a]
        ),
        spark,
    )
    sb = tokenize_pack.run(
        tokenize_pack.parse_args(
            ["--input", docs, "--merges", merges_out, "--output", out_b]
        ),
        spark,
    )
    assert sa["n_tokens_total"] == sb["n_tokens_total"]
    assert sorted(
        map(tuple, spark.read.parquet(out_a).collect())
    ) == sorted(map(tuple, spark.read.parquet(out_b).collect()))


def test_tokenize_pack_arg_validation():
    import pytest

    with pytest.raises(SystemExit):
        tokenize_pack.parse_args(["--output", "x"])
    with pytest.raises(SystemExit):
        tokenize_pack.parse_args(
            ["--encoded-input", "e", "--input", "i", "--merges", "m",
             "--output", "x"]
        )
