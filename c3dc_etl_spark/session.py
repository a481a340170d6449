"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
settings are cluster-safe. Every knob here is a scale decision:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting means
  one static ``spark.sql.shuffle.partitions`` works from sf0.001 to 100 TB.
- ANSI off: the engine's semantics (reference parity) are "invalid cast ->
  null + warn", not "error" (SURVEY.md V21; reference
  etl/target/c3dc_etl.py:1330-1344). Query code still uses try_* variants
  so it stays correct under a foreign ANSI-on session.
- Arrow on: every Python<->JVM handoff (pandas UDFs, toPandas) is batched.

Note on ``spark.sql.legacy.parquet.nanosAsLong``: the suite's events
loader (suite/registry.py ``read_events_parquet``) sets it ONLY when a
plain read fails with the nanos-timestamp incompatibility — and then it
stays set for the session (the conf is consulted again at scan
execution, so it cannot be restored before the caller collects). A
session that never touches nanos parquet keeps a pristine conf; one
that does would want the conf anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _default_driver_mem() -> str:
    """Local-mode driver heap default: ~45% of physical RAM, capped at
    48g, floored at 4g (ADVICE r12 #3: a hard 48g default sized to the
    128 GiB bench box would fail JVM startup or swap on smaller hosts).
    On the 128 GiB box this still derives 48g — the bench-comparable
    value round 12 measured (zero Full GCs, ~28.7 GB peak used).
    Override with SPARK_DRIVER_MEM."""
    total_kb = 0
    try:
        with open("/proc/meminfo") as fh:
            for ln in fh:
                if ln.startswith("MemTotal:"):
                    total_kb = int(ln.split()[1])
                    break
    except OSError:  # pragma: no cover — non-Linux host
        pass
    if total_kb <= 0:
        return "4g"
    return f"{max(4, min(48, (total_kb * 45) // (100 * 1024 * 1024)))}g"


def get_spark(app_name: str = "c3dc-etl-spark", **extra_conf: str) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # reducer count stays = cores here: raising AQE
        # initialPartitionNum session-wide was measured (r9) to cost
        # +40-150% on iterative queries (pagerank 4.8 -> 11.9s,
        # k-core 4.9 -> 9.5s at 2x cores; headline wall 57 -> 80s) —
        # local-mode per-task overhead dominates their many small
        # per-iteration shuffles. The x5 scale probes, whose heavy
        # single shuffles DO spill at fixed-cores reducers (triangle
        # census: 1.83x-per-unit wall), set it temporarily in the
        # probe context instead (bench.py scale_check, bench_sweep
        # --scale) — the bytes-aware sizing a real cluster gives a 5x
        # corpus, applied to BOTH sides of the ratio.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode-only knob (a cluster sizes executors independently):
        # in local[32] the driver heap IS the executor heap for all 32
        # task threads. 16g was marginal for the round-9 scale cohort —
        # a triangle-census x5 SortMergeJoin OOMed at ~3300 stages into
        # a bench session. Round 12 re-measured: a full bench session's
        # G1 heap peaks at ~28.7 GB USED (-Xlog:gc, headline+rotation at
        # sf0.1) — ABOVE the former 24g cap, and 24g sessions showed the
        # matching symptom: persistent mid-session 5-10x walls on
        # allocation-heavy queries (dedup_containment 36s vs 4s,
        # collect spikes to 47s) while a 48g session ran the same code
        # with 216 young pauses totalling 5.2s, max 397ms, zero Full
        # GCs, and no persistent degradation. 48g keeps ~60% of the
        # 128 GiB box free; on smaller hosts the default derives from
        # physical RAM instead (_default_driver_mem — ADVICE r12 #3);
        # override via SPARK_DRIVER_MEM.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
