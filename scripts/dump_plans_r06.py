"""Dump .explain("formatted") for registry queries into plans/r06/.

Usage: python scripts/dump_plans_r06.py [--suffix before|after] [query ...]

Produces plans/r06/<query>_<suffix>.txt at the bench scale factor
(sf0.1 by default) under the exact bench session conf, so plan-shape
claims in OPTIMIZATION_r06.md are checkable against these files.

NOTE: queries whose builders execute eagerly (the connected-components
loop) run real jobs during the dump; the dump is therefore NOT free and
must not run concurrently with a measurement.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_session  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--suffix", default="before")
    p.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    p.add_argument("queries", nargs="*")
    args = p.parse_args()

    import __spark_entry__ as entrymod

    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = make_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    registry = entrymod.queries()
    names = args.queries or list(registry)
    for name in names:
        spark.catalog.clearCache()
        try:
            df = registry[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {exc!r}"
        plan = re.sub(r"file:[^\],]*", "<path>", plan)
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
