#!/usr/bin/env python3
"""Per-round rotation derivations, mechanized (round 9).

Three cohorts rotate every round; each is DERIVED from committed
artifacts, never hand-curated, and each has a test pinning the result:

1. PRIORITY (driver correctness window): every registry query sorted by
   (latest driver-dated CORRECTNESS round ascending, name) — stalest
   greens re-verify first. Pinned exactly by tests/test_registry.py.
2. bench ROTATION (~45/round): never-benched queries — registry minus
   HEADLINE minus every committed BENCH_r* "queries"/"rotation_queries"
   row. Pinned disjoint by tests/test_registry.py.
3. SCALE_ROTATION (~6-10/round): adjudicated-heavy queries without a
   committed factor-5 linearity row — ranked here by their latest
   committed wall time. Contract pinned by
   tests/test_registry.py::test_scale_check_cohort_contract.

Run with no arguments from the repo root; paste the printed PRIORITY
list into __spark_entry__.py and pick the next ROTATION/SCALE_ROTATION
slices from the grouped candidates. Purely static — no SparkSession.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ledger_latest() -> dict[str, int]:
    """Latest driver round per query from the committed CORRECTNESS_r*
    ledgers (the same derivation tests/test_registry.py pins)."""
    latest: dict[str, int] = {}
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        rnd = int(fname[len("CORRECTNESS_r"):-len(".json")])
        with open(os.path.join(REPO, fname)) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def benched_and_times() -> tuple[set[str], dict[str, float]]:
    """Union of every committed BENCH ledger row, plus each query's
    latest committed wall time (BENCH_r* stdout maps + BENCH_DETAIL)."""
    import bench

    seen: set[str] = set(bench.HEADLINE)
    times: dict[str, float] = {}
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith("BENCH_r") and fname.endswith(".json")):
            continue
        try:
            with open(os.path.join(REPO, fname)) as fh:
                rec = json.load(fh)
        except ValueError:
            continue
        # driver records wrap the bench stdout JSON under "parsed"
        for src in (rec, rec.get("parsed") or {}):
            if not isinstance(src, dict):
                continue
            for key in ("queries", "rotation_queries"):
                for name, t in (src.get(key) or {}).items():
                    if name == "_truncated":
                        continue
                    seen.add(name)
                    if isinstance(t, (int, float)):
                        times[name] = float(t)
    detail = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(detail):
        with open(detail) as fh:
            rec = json.load(fh)
        for key in ("queries", "rotation"):
            for name, t in (rec.get(key) or {}).items():
                seen.add(name)
                times[name] = float(t)
    return seen, times


def scale_covered() -> set[str]:
    """Queries with a committed factor-5 linearity row: the CUMULATIVE
    SCALE_LEDGER.json (bench.py merges every run's rows into it, so
    prior rounds' rotated-out coverage is never forgotten), plus the
    current cohorts and BENCH_DETAIL as belt-and-braces."""
    import bench

    covered = set(bench.SCALE_CORE) | set(bench.SCALE_ROTATION)
    ledger = os.path.join(REPO, "SCALE_LEDGER.json")
    if os.path.exists(ledger):
        with open(ledger) as fh:
            covered |= set(json.load(fh))
    detail = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(detail):
        with open(detail) as fh:
            sc = json.load(fh).get("scale_check") or {}
        covered |= set(sc.get("linearity") or {})
    return covered


def main() -> int:
    import bench

    from c3dc_etl_spark.suite import REGISTRY

    latest = ledger_latest()
    missing = sorted(n for n in REGISTRY if n not in latest)
    if missing:
        print(f"# WARNING: {len(missing)} registry queries have no"
              f" driver-dated row: {missing}")
    order = sorted(REGISTRY, key=lambda n: (latest.get(n, 0), n))
    print("# --- PRIORITY (ledger stalest-first; paste into"
          " __spark_entry__.py) ---")
    print("PRIORITY = [")
    for n in order:
        print(f'    "{n}",')
    print("]")

    seen, times = benched_and_times()
    # builder-run sweep rows (scripts/bench_sweep.py) RANK the
    # scale-rotation candidates below but never mark a query "benched":
    # the driver-facing ROTATION keeps marching through all 300 so each
    # eventually gets a driver-recorded row
    sweep = os.path.join(REPO, "BENCH_LEDGER.json")
    if os.path.exists(sweep):
        with open(sweep) as fh:
            for name, row in json.load(fh).items():
                if "wall_s" in row:
                    times.setdefault(name, float(row["wall_s"]))
    never = sorted(n for n in REGISTRY if n not in seen)
    print(f"\n# --- never-benched ({len(never)} left; pick the next"
          " ~45 for ROTATION) ---")
    bytag = defaultdict(list)
    for n in never:
        tags = REGISTRY[n].tags
        bytag[tags[0] if tags else "?"].append(n)
    for t in sorted(bytag):
        print(f"# {t:14s} ({len(bytag[t])}): {' '.join(bytag[t])}")

    covered = scale_covered()
    heavy = sorted(
        ((t, n) for n, t in times.items()
         if n in REGISTRY and n not in covered),
        reverse=True,
    )
    print("\n# --- scale-rotation candidates (heaviest benched queries"
          " without a committed linearity row) ---")
    for t, n in heavy[:15]:
        print(f"# {t:8.2f}s  {n}")
    print(f"\n# bench ledger: {len(seen & set(REGISTRY))}/"
          f"{len(REGISTRY)} benched; scale rows: "
          f"{len(covered & set(REGISTRY))}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
