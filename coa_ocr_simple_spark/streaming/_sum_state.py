"""Shared sum-merged sketch-state sink for streaming twins whose
cross-batch state is an additive partial table (Count-Min grids,
value histograms): batch_id-keyed overwrite subdirectories + a
replay-aware compactor.

Because + is NOT idempotent (unlike HLL's max), replay safety rests on
two rules every consumer of this module inherits:

1. a replayed batch OVERWRITES its own ``batch=<id>`` subdirectory —
   never appends (write_partial);
2. compaction folds every partial EXCEPT the highest batch id — the
   only batch a checkpoint-resumed stream may re-deliver; folding it
   would turn that replay into a double count (compact_state).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partial(df: DataFrame, state_path: str, batch_id: int) -> None:
    """Idempotent per-batch state sink (batch_id-keyed overwrite — for
    a SUM-merged sketch the load-bearing half of replay safety)."""
    df.write.mode("overwrite").parquet(f"{state_path}/batch={int(batch_id)}")


def _sum_aggs(value):
    values = [value] if isinstance(value, str) else list(value)
    return [F.sum(v).cast("long").alias(v) for v in values]


def merged_state(
    spark: SparkSession, state_path: str, keys: list[str], value
) -> DataFrame:
    """The sum-merge of every partial written so far.  ``value`` is one
    column name or a list of additive columns."""
    return (
        spark.read.parquet(state_path).groupBy(*keys).agg(*_sum_aggs(value))
    )


def compact_state(
    spark: SparkSession, state_path: str, keys: list[str], value
) -> None:
    """Fold per-batch partials into a single ``batch=-1`` partial —
    EXCEPT the highest-numbered batch, which stays live as the replay
    target.  Call between triggers or with the query stopped."""
    batches = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(state_path)
        if name.startswith("batch=")
    )
    foldable = [b for b in batches[:-1] if b != -1] if len(batches) > 1 else []
    fold_dirs = [f"{state_path}/batch={b}" for b in foldable]
    if foldable and -1 in batches:
        fold_dirs.append(f"{state_path}/batch=-1")
    if not fold_dirs:
        return  # nothing beyond the compacted file / the replay target
    merged = (
        spark.read.parquet(*fold_dirs).groupBy(*keys).agg(*_sum_aggs(value))
    )
    tmp = tempfile.mkdtemp(prefix="sum_state_compact_")
    try:
        merged.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/batch=-1")
        for d in fold_dirs:
            shutil.rmtree(d)
        shutil.move(f"{tmp}/batch=-1", os.path.join(state_path, "batch=-1"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
