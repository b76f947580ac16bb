"""jobs/decontaminate.py — two-input exact n-gram decontamination: a
train doc embedding an eval sentence is flagged; --clean-output is the
corpus minus exactly the flagged docs."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from coa_ocr_simple_spark.jobs.decontaminate import parse_args, run


def _write(path, rows):
    pq.write_table(
        pa.Table.from_pylist(
            [
                {
                    "doc_id": i,
                    "text": t,
                    "lang": "en",
                    "source": "s",
                    "n_chars": len(t),
                }
                for i, t in rows
            ]
        ),
        str(path),
    )


def test_decontaminate_flags_leaky_train_docs(spark, tmp_path):
    eval_sent = " ".join(f"bench{i}" for i in range(15))  # 15 tokens: 3 grams
    filler = " ".join(f"pad{i}" for i in range(30))
    other = " ".join(f"other{i}" for i in range(30))

    train_path = tmp_path / "train.parquet"
    eval_path = tmp_path / "eval.parquet"
    _write(
        train_path,
        [
            (0, filler + " " + eval_sent),  # leaks the benchmark verbatim
            (1, filler),  # clean
            (2, other),  # clean
        ],
    )
    _write(
        eval_path,
        [(100, eval_sent), (101, " ".join(f"zz{i}" for i in range(20)))],
    )

    report = str(tmp_path / "report")
    clean = str(tmp_path / "clean")
    summary = run(
        parse_args(
            [
                "--train", str(train_path), "--eval", str(eval_path),
                "--report", report, "--clean-output", clean,
            ]
        ),
        spark,
    )
    assert summary["n_train"] == 3 and summary["n_eval"] == 2
    assert summary["n_flagged"] == 1 and summary["n_clean"] == 2

    rep = spark.read.parquet(report).collect()
    assert len(rep) == 1
    # 15 eval tokens -> 3 shared 13-grams, all from the one eval doc
    assert rep[0]["train_doc_id"] == 0
    assert rep[0]["n_overlap_grams"] == 3
    assert rep[0]["n_eval_docs"] == 1

    kept = sorted(r["doc_id"] for r in spark.read.parquet(clean).collect())
    assert kept == [1, 2]

    # re-running must REPLACE the report and clean output, not append —
    # a path-based parquet report that accumulates stale rows breaks any
    # consumer reading the whole directory (round-4 advice item)
    summary2 = run(
        parse_args(
            [
                "--train", str(train_path), "--eval", str(eval_path),
                "--report", report, "--clean-output", clean,
            ]
        ),
        spark,
    )
    assert summary2["n_flagged"] == 1
    assert spark.read.parquet(report).count() == 1  # not 2
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(clean).collect()
    ) == [1, 2]


def test_decontaminate_min_grams_threshold(spark, tmp_path):
    eval_sent = " ".join(f"bench{i}" for i in range(15))  # 3 shared grams
    train_path = tmp_path / "train2.parquet"
    eval_path = tmp_path / "eval2.parquet"
    _write(train_path, [(0, eval_sent)])
    _write(eval_path, [(100, eval_sent)])

    report = str(tmp_path / "report2")
    summary = run(
        parse_args(
            [
                "--train", str(train_path), "--eval", str(eval_path),
                "--report", report, "--min-grams", "4",
            ]
        ),
        spark,
    )
    assert summary["n_flagged"] == 0  # 3 shared grams < the 4-gram bar
