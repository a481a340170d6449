"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator family (SURVEY.md §2 + training-data ops) to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for the value-hash correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the derivations below import scripts.rotate_cohorts relative to this
# file, wherever the driver's cwd happens to be
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c3dc_etl_spark.suite import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SF0001)


# Driver-gate priority: the correctness gate verifies queries in dict
# order (with a bounded ~50-query per-round window). Round 10, per the
# r9 verdict items 1-2: PRIORITY is DERIVED AT IMPORT from the same
# committed artifacts the pinning test reads — never hand-pasted (the
# r9 paste went stale the moment the driver landed CORRECTNESS_r09).
# Order: queries whose code/oracle changed since their latest
# driver-dated green row (effectively untested) first, then every
# query stalest-driver-date-first. scripts/rotate_cohorts.py holds the
# derivation; QUERY_HASHES.json carries the per-query content hashes
# the change detection rides on.
_FALLBACK_MARKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "PRIORITY_FALLBACK.txt"
)
try:
    from scripts.rotate_cohorts import priority_order

    PRIORITY = priority_order()
    # a stale marker from a prior failed derivation must not outlive
    # the failure: success removes it so the committed ledger reflects
    # the CURRENT round's derivation state
    if os.path.exists(_FALLBACK_MARKER):  # pragma: no cover
        try:
            os.remove(_FALLBACK_MARKER)
        except OSError:
            pass
except Exception as _exc:  # pragma: no cover — ledgers unreadable on
    # this machine; alphabetical keeps the gate deterministic and
    # total, but NEVER silently: a corrupt QUERY_HASHES.json or a
    # derivation bug would otherwise erase the changed-first window.
    # Besides stderr (transient), drop a sentinel FILE beside the
    # ledgers (ADVICE r10): a fallback round becomes visible in the
    # committed artifacts, not just in scrollback that nobody rereads.
    import traceback

    print(
        "WARNING: __spark_entry__ PRIORITY derivation failed "
        f"({type(_exc).__name__}: {_exc}); falling back to "
        "alphabetical order",
        file=sys.stderr,
    )
    traceback.print_exc()
    try:
        with open(_FALLBACK_MARKER, "w") as _fh:
            _fh.write(
                "PRIORITY derivation failed at import; the driver gate "
                f"ran in ALPHABETICAL order this round.\n"
                f"{type(_exc).__name__}: {_exc}\n"
            )
    except OSError:
        pass
    PRIORITY = sorted(REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, emitted in
    verification-priority order (see PRIORITY)."""
    ordered = {name: REGISTRY[name].fn for name in PRIORITY if name in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec.fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; entries without SQL-expressible
    semantics (mapInPandas kernels) are omitted -> rows-only check."""
    names = list(queries())
    return {
        name: REGISTRY[name].oracle
        for name in names
        if REGISTRY[name].oracle is not None
    }
