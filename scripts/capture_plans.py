#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries into plans/<round>/
(round defaults to r16; override with SPARK_GRAFT_PLANS_ROUND).

Usage:
    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

With no query names, captures every bench.HEADLINE query. Plan-only
(no execution): cheap, safe to run alongside other work. The files are
the round-15 optimization deliverable the judge reads plan claims
against (<query>_before.txt / <query>_after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]

    from bench import HEADLINE
    from global_market_index_etl_spark.plans import REGISTRY
    from global_market_index_etl_spark.session import get_spark

    if not names:
        names = list(HEADLINE)

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="gmie-capture-plans")
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going: one broken row ≠ no capture
            plan = f"CAPTURE ERROR: {type(e).__name__}: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"-- {name} ({suffix}) @ {SF_DIR}\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
