"""ANN tier recall report: brute-force truth vs every search tier.

Recall is DETERMINISTIC on this corpus (no randomness anywhere in the
quantizers), so unlike wall-clock numbers this table is reproducible
bit-for-bit on any host — it is the committed evidence for the
recall/cost ladder the ANN family climbs:

    brute (exact)  >  ivf nprobe=1/2  >  ivf-pq (seed / lloyd / p2)
                   >  ivf-pq + exact re-rank

Run:  python scripts/ann_recall_report.py [--sf DIR]
Prints one JSON line; commit per round as BENCH/ann_recall_rNN.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pairs_of(fn, spark, sf):
    out = {
        (r["query_id"], r["neighbor_id"])
        for r in fn(spark, sf).collect()
    }
    spark.catalog.clearCache()
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    args = p.parse_args()

    from bench import make_session

    import __spark_entry__ as entry

    spark = make_session(32, shuffle_partitions=32)
    qs = {**entry.queries(), **entry.extra_queries()}

    truth = pairs_of(qs["ann_topk"], spark, args.sf)
    tiers = [
        "ann_ivf_search",
        "ann_ivf_search_p2",
        "ann_ivfpq_search",
        "ann_ivfpq_search_lloyd",
        "ann_ivfpq_search_lloyd_p2",
        "ann_ivfpq_rerank",
        "ann_ivfpq_rerank_ck",
    ]
    report = {"sf": args.sf, "n_truth_pairs": len(truth), "tiers": {}}
    for name in tiers:
        got = pairs_of(qs[name], spark, args.sf)
        report["tiers"][name] = {
            "n_pairs": len(got),
            "n_hit": len(truth & got),
            "recall_pct": round(100.0 * len(truth & got) / len(truth), 1),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
