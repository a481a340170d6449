#!/usr/bin/env python3
"""Headline benchmark for the driver: runs representative queries from the
suite at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_wall", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed via a full ``collect()`` (materializes the whole
result, same as the driver's correctness gate) after one warm-up pass of
the flagship query to amortize JVM/session startup out of per-query time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# One per operator family: TPC-H-ish aggregation/join, window dedup,
# harmonization pipeline shapes, exact + approximate dedup, ANN, text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_volume",
    "survival_latest_window",
    "fingerprint_dedup_first_wins",
    "typegroup_fanout_union",
    "explode_subrecords",
    "link_wiring_collect",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality_features",
    "pivot_long_to_wide",
    "pii_redaction",
    "sequence_packing",
    "sessionize_events",
    "rollup_hypertable",
    "sketch_kmv_distinct",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from c3dc_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm-up: JVM + parquet footer caches, not counted.
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    missing = [name for name in HEADLINE if name not in qs]
    if missing:
        # a renamed/dropped query must fail the benchmark loudly, not
        # silently shrink the reported suite wall
        raise SystemExit(f"HEADLINE queries missing from registry: {missing}")

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = round(time.perf_counter() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
