"""BM25 ranked retrieval invariants + independent-reference agreement.

DuckDB value parity is enforced by tests/test_extra_oracles.py /
check_oracles (bm25_topk is an EXTRA registry entry); these pin what an
oracle diff can't explain on its own: the ranking agrees with an
independently-coded FLOAT BM25 (same disclosed surrogates — un-logged
Robertson odds idf, k1=1.2 / b=0.75 — but float division and no
mille quantization), and the output invariants hold.
"""

from __future__ import annotations

import collections
import re

import pyarrow.parquet as pq

import __spark_entry__ as entrymod
from coa_ocr_simple_spark.plans.driver_queries_corpus import (
    _BM25_QLEN,
    _BM25_QUERIES,
    _BM25_TOPK,
)

SF = "/root/testdata/sf0.001"


def _float_bm25_reference(path: str):
    """Pure-Python float BM25 over the same tokenization and the same
    query-construction rule; returns {query_id: [doc_id ranked]}."""
    tbl = pq.read_table(path, columns=["doc_id", "text"])
    docs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    tf: dict[tuple[int, str], int] = collections.Counter()
    dl: dict[int, int] = collections.Counter()
    dfreq: dict[str, int] = collections.Counter()
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        for t in toks:
            tf[(doc_id, t)] += 1
        dl[doc_id] += len(toks)
        for t in set(toks):
            dfreq[t] += 1
    n = len(docs)
    avgdl = sum(dl.values()) / n
    band = [
        (d, t)
        for t, d in dfreq.items()
        if d * 20 >= n and d * 10 <= n * 9
    ]
    band.sort(key=lambda x: (-x[0], x[1]))
    qterms: dict[int, list[str]] = collections.defaultdict(list)
    for rn, (_, t) in enumerate(band[: _BM25_QUERIES * _BM25_QLEN]):
        qterms[rn // _BM25_QLEN].append(t)
    k1, b = 1.2, 0.75
    out = {}
    for qid, ts in qterms.items():
        scores: dict[int, float] = collections.defaultdict(float)
        for t in ts:
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)  # un-logged odds
            for doc_id, _ in docs:
                f = tf.get((doc_id, t), 0)
                if not f:
                    continue
                scores[doc_id] += idf * (
                    f * (k1 + 1) / (f + k1 * (1 - b + b * dl[doc_id] / avgdl))
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        out[qid] = [d for d, _ in ranked[:_BM25_TOPK]]
    return out


def test_bm25_invariants_and_float_reference_agreement(spark):
    rows = entrymod.extra_queries()["bm25_topk"](spark, SF).collect()
    spark.catalog.clearCache()
    by_q: dict[int, list] = collections.defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    assert sorted(by_q) == list(range(_BM25_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_micro"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)

    ref = _float_bm25_reference(f"{SF}/documents.parquet")
    assert sorted(ref) == sorted(by_q)
    for q in ref:
        spark_docs = [r["doc_id"] for r in sorted(by_q[q], key=lambda r: r["rank"])]
        # the integer recipe quantizes tf_part at mille precision, so
        # individual near-tie adjacent ranks may swap vs float math —
        # but the top-1 must agree and the top-k sets must be near-equal
        assert spark_docs[0] == ref[q][0]
        assert len(set(spark_docs) & set(ref[q])) >= _BM25_TOPK - 2
