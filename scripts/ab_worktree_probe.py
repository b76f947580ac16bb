"""Interleaved same-window A/B of two repo trees (round 6 methodology).

Per-query steady probes on this host drift ±30-40% between windows even
with clean canaries, so cross-round performance claims are settled by
running the SAME query set against two trees in alternating fresh JVMs
within one window and comparing min-of-all-reps per tree:

    # worker (one tree, one JVM):
    python scripts/ab_worktree_probe.py --tree /path/to/tree \\
        [--queries q1 q2 ...]            # prints one JSON line

    # driver pattern (what round 6 ran):
    git worktree add /tmp/oldtree <round-start-commit>
    for rep in 1 2:
        python scripts/ab_worktree_probe.py --tree /tmp/oldtree > old_$rep
        python scripts/ab_worktree_probe.py --tree /root/repo  > new_$rep
    # merge: per query, min over both reps of each tree

Each worker: 2 warmups of a chain query, then 3 counted reps per query
with clearCache between (the steady_probe discipline).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

DEFAULT_QUERIES = [
    "dedup_minhash_bands", "ngram_jaccard_pairs", "contamination_pairs",
    "neardup_clusters", "embedding_clusters", "curation_funnel",
    "edit_distance_pairs", "lm_perplexity", "gram_decontamination",
    "repetition_stats", "asof_last_view",
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tree", required=True)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    args = p.parse_args()

    sys.path.insert(0, args.tree)
    from bench import make_session, force  # noqa: E402 (tree's bench)

    import __spark_entry__ as entry  # noqa: E402

    spark = make_session(32)
    registry = {**entry.queries(), **entry.extra_queries()}
    for _ in range(2):
        spark.catalog.clearCache()
        force(registry["ngram_jaccard_pairs"](spark, args.sf))
    out = {}
    for name in args.queries:
        vals = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(registry[name](spark, args.sf))
            vals.append(round(time.perf_counter() - t0, 3))
        out[name] = vals
        print(name, min(vals), vals, file=sys.stderr, flush=True)
    print(json.dumps({"tree": args.tree, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
