#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json files per-query (collect medians for
headline, timed collects for rotation), flagging moves beyond a ratio.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--flag 1.25]
Accepts git refs via ref:path (e.g. HEAD:BENCH_DETAIL.json).
"""
from __future__ import annotations

import argparse
import json
import subprocess


def _load(spec: str) -> dict:
    if ":" in spec and not spec.endswith(".json") or spec.count(":") == 1 and "/" not in spec.split(":")[0]:
        ref, path = spec.split(":", 1)
        return json.loads(subprocess.check_output(["git", "show", f"{ref}:{path}"]))
    return json.load(open(spec))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.25)
    args = ap.parse_args()
    old, new = _load(args.old), _load(args.new)

    print(f"{'':38s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    print(f"suite_wall{'':28s} {old['value']:8.3f} {new['value']:8.3f} "
          f"{new['value']/old['value']:6.2f}")
    print(f"session_factor{'':24s} {old['session_factor']:8.3f} "
          f"{new['session_factor']:8.3f}")
    for section in ("queries", "rotation", "compute"):
        o, n = old.get(section, {}), new.get(section, {})
        rows = []
        for k in sorted(set(o) | set(n)):
            if k in o and k in n and o[k] > 0:
                rows.append((n[k] / o[k], k, o[k], n[k]))
        rows.sort(reverse=True)
        print(f"\n== {section} (sorted by ratio, flag >= {args.flag}) ==")
        for r, k, ov, nv in rows:
            mark = " <<<" if r >= args.flag or r <= 1 / args.flag else ""
            print(f"{k:38s} {ov:8.3f} {nv:8.3f} {r:6.2f}{mark}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
