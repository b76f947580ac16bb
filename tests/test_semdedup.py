"""semdedup_prune: cluster-scoped semantic pruning (SemDeDup, Abbas et
al. 2023) pinned against an independent Python reference — plain dicts
and loops, not the Spark plan's join shape."""

from __future__ import annotations

import random

from coa_ocr_simple_spark.plans.driver_queries_dedup import (
    _MAX_SEMDEDUP_CLUSTER,
    _SEMDEDUP_TAU_SQ_E4,
    semdedup_prune,
)
from coa_ocr_simple_spark.plans.driver_queries_ext import _IVF_CENTROID_MOD

DIM = 8


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )


def _q(x: float) -> int:
    # Spark F.round / DuckDB ROUND: half away from zero
    mag = abs(x) * 1000
    q = int(mag) + (1 if mag - int(mag) >= 0.5 else 0)
    return -q if x < 0 else q


def _ref(vecs):
    qv = {i: [_q(x) for x in v] for i, v in vecs.items()}
    nrm = {i: sum(c * c for c in q) for i, q in qv.items()}
    cents = sorted(i for i in qv if i % _IVF_CENTROID_MOD == 1)
    assert cents, "test corpus must contain at least one centroid seed"

    def dot(a, b):
        return sum(p * q for p, q in zip(a, b))

    assign = {}
    for i in qv:
        best = max(cents, key=lambda c: (dot(qv[i], qv[c]), -c))
        assign[i] = (best, dot(qv[i], qv[best]))
    csz: dict[int, int] = {}
    for i, (c, _) in assign.items():
        csz[c] = csz.get(c, 0) + 1

    nsim = {i: 0 for i in qv}
    dropped = set()
    ids = sorted(qv)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ca, cb = assign[a], assign[b]
            if ca[0] != cb[0] or csz[ca[0]] > _MAX_SEMDEDUP_CLUSTER:
                continue
            d = dot(qv[a], qv[b])
            if not (
                d > 0 and 10000 * d * d > _SEMDEDUP_TAU_SQ_E4 * nrm[a] * nrm[b]
            ):
                continue
            nsim[a] += 1
            nsim[b] += 1
            ka = ca[1] * abs(ca[1]) * nrm[b]
            kb = cb[1] * abs(cb[1]) * nrm[a]
            if ka > kb:
                dropped.add(a)
            elif ka < kb:
                dropped.add(b)
            else:
                dropped.add(max(a, b))
    return {
        i: (assign[i][0], nsim[i], int(i in dropped)) for i in qv
    }


def _collect(df):
    return {
        r["vec_id"]: (
            r["centroid_id"],
            r["n_similar"],
            r["is_semdup_dropped"],
        )
        for r in df.collect()
    }


def test_matches_independent_reference_with_planted_dups(spark):
    rng = random.Random(23)
    vecs = {}
    for i in range(180):
        vecs[i] = [rng.uniform(-1, 1) for _ in range(DIM)]
    # planted near-duplicates: tiny perturbations of existing vectors —
    # far above the cosine-0.4 threshold, so each plants a dup pair
    for j, src in enumerate((3, 7, 7, 50, 99, 120)):
        vecs[200 + j] = [x + rng.uniform(-0.01, 0.01) for x in vecs[src]]
    got = _collect(semdedup_prune(_emb_df(spark, vecs)))
    want = _ref(vecs)
    assert got == want
    assert sum(d for _, _, d in got.values()) > 0  # something was pruned


def test_keep_policy_prefers_centroid_outlier(spark):
    # cluster seed = centroid vec 1; vec 10 sits ON the centroid ray
    # (cos-to-centroid 1.0), vec 11 is the same direction but offset —
    # similar to 10 yet farther from the centroid.  SemDeDup keeps the
    # outlier (11) and drops the centroid-typical member (10).
    base = [1.0, 0.5, -0.25, 0.125, 1.0, -0.5, 0.25, -0.125]
    off = [x + 0.18 * (1 if k % 2 else -1) for k, x in enumerate(base)]
    vecs = {1: base, 10: [x * 0.9 for x in base], 11: off}
    got = _collect(semdedup_prune(_emb_df(spark, vecs)))
    assert got == _ref(vecs)
    assert got[10][2] == 1 and got[11][2] == 0
    # the centroid vector itself is also cos-1.0 to vec 10: of that
    # pair the one with lower centroid-sim key survives per the rule
    assert got[10][1] >= 1 and got[11][1] >= 1


def test_semdedup_job_writes_verdicts_and_pruned(spark, tmp_path):
    """jobs/semdedup.py end to end: verdict control table + pruned
    payload agree with the standalone frame; re-run overwrites."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coa_ocr_simple_spark.jobs.semdedup import parse_args, run

    rng = random.Random(67)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(DIM)] for i in range(150)}
    for j, src in enumerate((2, 5, 5, 40)):
        vecs[160 + j] = [x + rng.uniform(-0.01, 0.01) for x in vecs[src]]
    path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"vec_id": i, "embedding": [float(x) for x in v]}
                for i, v in sorted(vecs.items())
            ],
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        ),
        path,
    )
    verd = str(tmp_path / "verdicts")
    pruned = str(tmp_path / "pruned")
    args = parse_args(
        ["--input", path, "--verdicts", verd, "--pruned", pruned]
    )
    summary = run(args, spark)
    want = _ref(vecs)
    got = {
        r["vec_id"]: (r["centroid_id"], r["n_similar"], r["is_semdup_dropped"])
        for r in spark.read.parquet(verd).collect()
    }
    assert got == want
    n_drop = sum(d for _, _, d in want.values())
    assert summary["n_dropped"] == n_drop > 0
    kept_ids = {r["vec_id"] for r in spark.read.parquet(pruned).collect()}
    assert kept_ids == {i for i, (_, _, d) in want.items() if d == 0}
    assert summary["n_pruned_rows"] == len(kept_ids)
    # re-run: overwrite semantics, no row accumulation
    summary2 = run(args, spark)
    assert summary2 == summary
    assert spark.read.parquet(verd).count() == len(want)
