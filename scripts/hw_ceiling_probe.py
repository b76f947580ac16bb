"""Hardware scaling ceiling probe (same-window companion to bench.py --scaling).

Measures how well THIS HOST, under CURRENT conditions, scales the identical
per-document extraction work (coa_ocr_simple_spark.core.pipeline.
extract_document over the bench corpus) using plain Python multiprocessing —
no Spark, no shuffle, no scheduler: an embarrassingly-parallel upper bound.

The measured efficiency is the hardware ceiling against which the pipeline's
bench.py --scaling number must be read: on an idle host the 4 pinned cores of
the small leg clock higher (turbo) than 16 busy cores, so even perfect
software scales below 1.0 — and the ceiling itself moves run to run with
outside-sandbox load.  Always run this back-to-back with bench.py --scaling
in the SAME window and report the pipeline/ceiling ratio.

Usage:
    python scripts/hw_ceiling_probe.py [--n-small 4] [--n-large 16]
Prints one JSON line and writes BENCH/hw_ceiling_latest.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_CACHE = "/tmp/coa_bench_corpus"
BENCH_DOCS = int(os.environ.get("COA_BENCH_DOCS", "100000"))

_DOCS = None  # worker-global via fork
_MEDIA = None


def _load_corpus(n_docs: int):
    import pyarrow.parquet as pq

    docs_path = f"{CORPUS_CACHE}_{n_docs}_docs.parquet"
    media_path = f"{CORPUS_CACHE}_{n_docs}_media.parquet"
    if not os.path.exists(docs_path):
        from coa_ocr_simple_spark.fixtures.generate import (
            build_bench_corpus,
            write_corpus,
        )

        write_corpus(build_bench_corpus(n_docs), docs_path, media_path, n_files=32)
    docs = pq.read_table(docs_path).to_pylist()
    media = {
        m["media_ref"]: (list(m["pages"]), list(m["ocr_pages"]))
        for m in pq.read_table(media_path).to_pylist()
    }
    return docs, media


def _work(idx_range):
    from coa_ocr_simple_spark.core.pipeline import extract_document

    lo, hi = idx_range
    lookup = lambda ref: _MEDIA.get(ref, ([], []))
    n = 0
    for d in _DOCS[lo:hi]:
        extract_document(d["doc_id"], d["spans"], lookup)
        n += 1
    return n


def worker_main(procs: int, n_docs: int) -> None:
    """Runs inside a taskset-pinned subprocess: time the full corpus twice."""
    global _DOCS, _MEDIA
    _DOCS, _MEDIA = _load_corpus(n_docs)
    chunks = []
    step = max(1, len(_DOCS) // (procs * 16))
    for lo in range(0, len(_DOCS), step):
        chunks.append((lo, min(lo + step, len(_DOCS))))
    times = []
    with mp.Pool(procs) as pool:
        for _ in range(2):
            t0 = time.perf_counter()
            total = sum(pool.imap_unordered(_work, chunks))
            times.append(time.perf_counter() - t0)
    assert total == len(_DOCS)
    print(json.dumps({"procs": procs, "docs": total, "sec": min(times)}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-small", type=int, default=4)
    p.add_argument("--n-large", type=int, default=16)
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--bench-docs", type=int, default=BENCH_DOCS)
    args = p.parse_args()
    if args.worker is not None:
        worker_main(args.worker, args.bench_docs)
        return
    _load_corpus(args.bench_docs)  # build once, outside the timed subprocesses
    results = {}
    for procs in (args.n_small, args.n_large):
        out = subprocess.run(
            [
                "taskset", "-c", f"0-{procs - 1}",
                sys.executable, os.path.abspath(__file__),
                "--worker", str(procs), "--bench-docs", str(args.bench_docs),
            ],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[procs] = json.loads(line)
    tput = {c: r["docs"] / r["sec"] for c, r in results.items()}
    ratio = args.n_large / args.n_small
    summary = {
        "kind": "pure-python multiprocessing hardware ceiling",
        "n_docs": args.bench_docs,
        "throughput_docs_per_sec": {str(c): round(t, 1) for c, t in tput.items()},
        "wall_sec": {str(c): round(r["sec"], 2) for c, r in results.items()},
        "ceiling_efficiency": round(
            tput[args.n_large] / (ratio * tput[args.n_small]), 3
        ),
    }
    with open(os.path.join(REPO, "BENCH", "hw_ceiling_latest.json"), "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
