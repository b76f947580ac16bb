"""Distributed BPE tokenizer training — the missing tail of the
training-data pipeline (dedup -> quality -> mixture -> decontaminate ->
pack -> shard -> *train the tokenizer*).

Shape (the production shape real BPE trainers use, kept distributed so
a billion-entry word vocabulary still fits):

1. ONE corpus-wide shuffle: explode whitespace words, groupBy word ->
   (word, weight).  Everything after runs on this vocab table, which is
   orders of magnitude smaller than the corpus.
2. Per merge round: adjacent symbol pairs explode from each word's
   symbol array weighted by the word count; a map-side-combinable
   groupBy(pair).sum(weight) finds the winner (deterministic tie-break:
   max weight, then lexicographically smallest pair); the merge is
   applied to every word with a JVM-side left-to-right non-overlapping
   fold (F.aggregate) — no Python in the loop.  The driver loop
   localCheckpoints the small vocab frame each round (constant plan
   depth, the connected-components pattern).

Counting uses ALL adjacent pairs (overlapping — "aaa" counts (a,a)
twice); merging is left-to-right non-overlapping ("aaa" -> ["aa","a"]),
matching the reference BPE algorithm (Sennrich et al. 2016 / GPT-2).
tests/test_bpe.py pins exact merge-list equality against an
independent pure-Python implementation, tie-breaks included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 1  # vocab frame is tiny; keep plan depth constant


def word_weights(docs: DataFrame) -> DataFrame:
    """(word, weight): the single corpus-wide shuffle."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "word"
            )
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _adjacent_pairs(seq_col):
    """array of (a, b) structs for every adjacent symbol pair."""
    n = F.size(seq_col)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(seq_col, 1, n - 1),
            F.slice(seq_col, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _merge_fold(seq_col, a: str, b: str):
    """Left-to-right non-overlapping replacement of (a, b) -> a+b,
    entirely JVM-side: fold the symbol array with a (out, pend)
    accumulator — pend holds the previous unconsumed symbol; a merge
    consumes it so "aaa" becomes ["aa", "a"], never ["aa", "aa"]."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        merged = (acc["pend"] == a) & (x == b)
        return F.struct(
            F.when(
                merged, F.concat(acc["out"], F.array(F.lit(a + b)))
            )
            .when(
                acc["pend"].isNotNull(),
                F.concat(acc["out"], F.array(acc["pend"])),
            )
            .otherwise(acc["out"])
            .alias("out"),
            F.when(merged, F.lit(None).cast("string")).otherwise(x).alias(
                "pend"
            ),
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNotNull(),
            F.concat(acc["out"], F.array(acc["pend"])),
        ).otherwise(acc["out"])

    return F.aggregate(seq_col, init, step, finish)


def train_bpe(
    docs: DataFrame, n_merges: int, *, min_pair_weight: int = 2
) -> list[tuple[str, str, int]]:
    """Learn up to n_merges BPE merges from the corpus; returns
    [(a, b, weight), ...] in merge order.  Stops early when no pair
    reaches min_pair_weight (merging a hapax pair is noise)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    vocab = word_weights(docs).select(
        "weight", F.split(F.col("word"), "").alias("seq")
    )
    vocab = vocab.localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            vocab.select("weight", F.explode(_adjacent_pairs(F.col("seq"))).alias("p"))
            .groupBy("p")
            .agg(F.sum("weight").alias("w"))
            .orderBy(F.desc("w"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["w"] < min_pair_weight:
            break
        a, b, w = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["w"])
        merges.append((a, b, w))
        vocab = vocab.select(
            "weight", _merge_fold(F.col("seq"), a, b).alias("seq")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges


def bpe_encode(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Driver-side encoder applying the learned merges in order — the
    oracle-free round-trip check (and what a tokenizer ships)."""
    seq = list(word)
    for a, b, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq
