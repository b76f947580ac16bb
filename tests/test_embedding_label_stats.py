"""embedding_label_stats: independent integer reference agreement.

The oracle re-runs mirrored SQL; this re-implements the centroid /
dispersion math independently (plain Python ints, same truncating
division) from the raw parquet, so a plumbing mistake in the
posexplode/rebuild/join chain can't hide behind a mirrored oracle."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_label_stats_match_independent_reference(spark):
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    labels = tbl.column("label").to_pylist()
    vecs = [
        [int(round(x * 1000)) for x in v]
        for v in tbl.column("embedding").to_pylist()
    ]
    by_label = collections.defaultdict(list)
    for lab, v in zip(labels, vecs):
        by_label[lab].append(v)

    expected = {}
    for lab, vs in by_label.items():
        n = len(vs)
        dim = len(vs[0])
        sums = [sum(v[d] for v in vs) for d in range(dim)]
        centroid = [_tdiv(s, n) for s in sums]
        s_nrm = sum(sum(x * x for x in v) for v in vs)
        s_sq = sum(
            sum((x - c) * (x - c) for x, c in zip(v, centroid)) for v in vs
        )
        expected[lab] = (
            n,
            _tdiv(s_nrm, n),
            tuple(centroid),
            _tdiv(s_sq, n),
        )

    got = {
        r["label"]: (
            r["n_vectors"],
            r["mean_sq_norm"],
            tuple(r["centroid_m"]),
            r["msd"],
        )
        for r in entrymod.extra_queries()["embedding_label_stats"](
            spark, SF
        ).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    # dispersion around the label centroid never exceeds dispersion
    # around the origin beyond the centroid-truncation slack (<= dim)
    for lab, (_, msn, centroid, msd) in got.items():
        assert msd <= msn + len(centroid)
