#!/usr/bin/env python3
"""Mechanized normalized-wall regression fence (VERDICT r11 ask #4).

PLANS.md commits the comparison rule — "a per-query mover only counts
as a regression when it exceeds its prior wall by >1.25x AFTER
normalization" — but until round 12 nothing computed it: every round
spent judge/builder time adjudicating walls by hand. This script is
the rule as code.

``BENCH_FENCE.json`` holds the committed per-query NORMALIZED walls
(query wall / session_factor) of the comparison base, plus the suite's
``value_normalized``. The check mode reads a BENCH_DETAIL.json,
normalizes its walls the same way, and flags every query whose
normalized wall exceeds the committed one by more than RATIO — with an
absolute SLACK floor, because a 0.05s -> 0.08s flip on a
scheduling-floor-dominated query is noise, not a regression (the
sub-0.2s-row reading rule the scale ledger already follows).

Usage (repo root):
  python3 scripts/bench_fence.py                    # check BENCH_DETAIL.json
  python3 scripts/bench_fence.py --baseline         # (re)write BENCH_FENCE.json
  python3 scripts/bench_fence.py path/to/DETAIL.json

Exit status: 0 = no regression, 1 = offenders listed on stdout.
``--baseline`` is run when a round's bench is ACCEPTED as the new
comparison base (the r11 artifact was accepted by the r11 verdict);
re-running it after an unreviewed regression would bake the regression
in, so it stays a deliberate, commit-reviewed step.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FENCE = os.path.join(REPO, "BENCH_FENCE.json")

RATIO = 1.25
SLACK_S = 0.15


def normalized_walls(detail: dict) -> dict[str, float]:
    """Per-query normalized walls of a BENCH_DETAIL payload, plus the
    suite-level row under the reserved name ``__suite__``."""
    sf = float(detail.get("session_factor") or 1.0) or 1.0
    out = {
        q: round(w / sf, 4) for q, w in (detail.get("queries") or {}).items()
    }
    if detail.get("value_normalized") is not None:
        out["__suite__"] = float(detail["value_normalized"])
    elif detail.get("value") is not None:
        out["__suite__"] = round(float(detail["value"]) / sf, 4)
    return out


def check(
    detail: dict,
    fence: dict,
    *,
    ratio: float = RATIO,
    slack_s: float = SLACK_S,
) -> list[dict]:
    """Offender rows for every query present on BOTH sides whose
    normalized wall exceeds the committed one by > ratio AND by more
    than slack_s seconds absolute. Queries on one side only (cohort
    growth/rotation) are not comparable and are skipped. An offender
    whose query appears in the fence's ``_adjudicated`` map (a
    committed, reviewed same-code adjudication — e.g. proven
    environment drift) carries its reason under ``adjudicated``;
    offenders WITHOUT one are the actionable regressions."""
    now = normalized_walls(detail)
    adjudicated = fence.get("_adjudicated") or {}
    offenders = []
    for q, wall in sorted(now.items()):
        base = fence.get(q)
        if base is None or not isinstance(base, (int, float)) or base <= 0:
            continue
        if wall > ratio * base and wall - base > slack_s:
            row = {
                "query": q,
                "committed_normalized_s": base,
                "normalized_s": wall,
                "ratio": round(wall / base, 3),
            }
            if q in adjudicated:
                row["adjudicated"] = adjudicated[q]
            offenders.append(row)
    return offenders


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--baseline"]
    detail_path = args[0] if args else os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as fh:
        detail = json.load(fh)
    if "--baseline" in sys.argv[1:]:
        walls = normalized_walls(detail)
        with open(FENCE, "w") as fh:
            json.dump(walls, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(walls)} committed normalized walls -> {FENCE}")
        return 0
    if not os.path.exists(FENCE):
        print("no BENCH_FENCE.json committed; run --baseline first")
        return 1
    with open(FENCE) as fh:
        fence = json.load(fh)
    offenders = check(detail, fence)
    new = [o for o in offenders if "adjudicated" not in o]
    known = [o for o in offenders if "adjudicated" in o]
    if known:
        print(json.dumps({"adjudicated": known}, indent=1))
    if new:
        print(json.dumps({"regressions": new}, indent=1))
        return 1
    n = len(set(normalized_walls(detail)) & set(fence))
    print(
        f"fence OK: {n} comparable queries, no UNADJUDICATED mover "
        f"> {RATIO}x committed ({len(known)} adjudicated)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
