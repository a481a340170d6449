#!/usr/bin/env python3
"""Round-12 optimization probe: time individual registry queries at an
sf dir with the bench methodology (warm-up, then timed collect x N and
a noop-sink compute pass), and write their .explain("formatted") plans
to plans/r12/<query>_<tag>.txt.

Usage:
  python scripts/opt_probe.py [--sf SF_DIR] [--runs N] [--tag before|after]
                              [--plans-only] query [query ...]

The noop pass (guide §1.4) computes every column of every row with no
driver row materialization — it isolates the PLAN's cost from the
collect()-to-Python cost the bench's headline methodology includes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None, help="write plans/r12/<q>_<tag>.txt")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from c3dc_etl_spark.pinning import release_pinned
    from c3dc_etl_spark.session import get_spark
    from c3dc_etl_spark.suite import REGISTRY

    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("opt-probe")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.queries:
        fn = REGISTRY[name].fn
        if args.tag:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            release_pinned()
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"# plan -> {path}", file=sys.stderr)
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"probe:{name}:warmup")
        fn(spark, args.sf).collect()
        release_pinned()
        noops, collects = [], []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe:{name}:noop{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            release_pinned()
            noops.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(f"probe:{name}:collect{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            release_pinned()
            collects.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: noop median {sorted(noops)[len(noops)//2]:.3f}s {noops}"
            f"  collect median {sorted(collects)[len(collects)//2]:.3f}s {collects}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
