#!/usr/bin/env python
"""Capture .explain("formatted") for headline (or named) queries into
plans/<round>/<name>_<tag>.txt — the optimization round's plan evidence.

Usage: python scripts/capture_plans.py <tag> [name ...]
With no names: the bench HEADLINE set. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the benched scale. The round
directory defaults to r09 (override with $PLANS_ROUND).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postrack_spark.queries import load_all
from postrack_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r09"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    specs = load_all()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
