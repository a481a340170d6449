"""Structured Streaming suite queries — oracle-checked.

These run the ACTUAL streaming engine path (``readStream`` -> watermarked
transformation -> memory sink, availableNow trigger) over the test
parquet, then return the sink table, so the oracle hash proves the
streaming operators — not a batch re-implementation — produce the right
rows. Mirrors the reference's file-arrival incremental model
(etl/ccdi/c3dc_etl.py:1506-1513 re-runs the whole harmonization per
source-file change; here arrival processing is incremental).

Determinism notes:
- ``availableNow`` processes the existing backlog then stops, so the
  result is a pure function of the input files.
- The windowed aggregate runs in COMPLETE output mode: every window is
  emitted regardless of the final watermark, so the sink equals the
  batch GROUP BY (append mode would hold back windows newer than the
  watermark delay at stream end).
- The stateful dedup emits exactly one row per new key in append mode;
  only the deterministic columns (digest, count) are returned — which
  physical row won a within-batch race is not part of the contract.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c3dc_etl_spark.streaming.sizing import DRAIN_STATE_BYTES, state_partitions
from c3dc_etl_spark.streaming.stateful import running_key_stats
from c3dc_etl_spark.streaming.arrivals import (
    session_window_stats,
    streaming_exact_dedup,
    sliding_window_counts,
    windowed_event_counts,
)
from c3dc_etl_spark.streaming.upsert import read_snapshot, run_upsert_stream
from c3dc_etl_spark.suite.registry import query, read_events_parquet

_DAY_US = 86_400_000_000


def _table_stream(spark: SparkSession, sf_dir: str, table: str):
    """File-source stream over ONE test table. The file source requires
    a directory path, so stream the sf directory with a glob filter
    pinned to the table's file; schema comes from a batch metadata read
    (streaming sources cannot infer)."""
    # Self-contained tz determinism, like registry.load: the NTZ ->
    # TIMESTAMP casts and unix_micros outputs below assume UTC epoch
    # math regardless of the harness session's timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{table}.parquet"
    # events may be TIMESTAMP(NANOS) parquet: the batch metadata read
    # routes through the fallback that sets the legacy conf only when
    # genuinely needed; the streaming scan then sees the same conf.
    schema = (
        read_events_parquet(spark, path) if table == "events"
        else spark.read.parquet(path)
    ).schema
    if os.path.isdir(path):
        # directory parquet (the x5 scale corpus; test sf dirs are
        # single files): the file source does NOT recurse into a
        # directory matched by a glob — it would list zero files and
        # silently stream an empty table — so stream the table
        # directory itself and glob its part files.
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "part-*.parquet")
            .parquet(path)
        )
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{table}.parquet")
            .parquet(sf_dir)
        )
    return stream, schema


def _with_event_ts(stream: DataFrame, schema) -> DataFrame:
    """Normalize the events ``ts`` column to a watermarkable TIMESTAMP
    ``event_ts``: testdata parquet is TIMESTAMP(NANOS) read as long
    nanos under the legacy conf, a future regeneration may carry
    TIMESTAMP_NTZ; with the session tz pinned UTC both convert
    epoch-identically (withWatermark rejects NTZ)."""
    if dict((f.name, f.dataType.simpleString()) for f in schema)["ts"] == "bigint":
        return stream.withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("event_ts", F.col("ts").cast("timestamp"))


def _run_to_memory(result: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion into an in-memory
    sink table (availableNow: drain the backlog, then stop).

    State partitions are scoped for the drain (derived from state
    volume via streaming.sizing.state_partitions — 8 for the measured
    ~100 MB drain states; SPARK_GRAFT_STREAM_STATE_PARTS to override):
    the partition count is read from spark.sql.shuffle.partitions at
    stream start and baked into the checkpoint, and each state
    partition pays per-batch snapshot/delta FILE overhead on every
    micro-batch — at cores-count (32) partitions that overhead
    dominated the states here (outer-join eviction drain: 14.7s ->
    5.5s at 8, identical results; results are partition-count-
    independent by construction). At cluster scale the same derivation
    sizes UP: state-volume / per-partition budget, never a core
    count."""
    spark = result.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    parts_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(parts_key)
    spark.conf.set(
        parts_key,
        os.environ.get(
            "SPARK_GRAFT_STREAM_STATE_PARTS",
            str(state_partitions(DRAIN_STATE_BYTES)),
        ),
    )
    try:
        sq = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
    finally:
        spark.conf.set(parts_key, prev)
    return spark.table(name)


_WINCOUNT_ORACLE = f"""
SELECT (EPOCH_US(ts) // {_DAY_US}) * {_DAY_US} AS win_start_us,
       (EPOCH_US(ts) // {_DAY_US}) * {_DAY_US} + {_DAY_US} AS win_end_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2, 3
"""


@query("streaming_windowed_counts", oracle=_WINCOUNT_ORACLE, tags=("streaming",))
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregate, end to end
    through the streaming engine: file-source ``readStream`` over the
    events parquet -> 1-day event-time windows per event_type (30 min
    watermark bounds state at scale) -> complete-mode memory sink.
    Because the session timezone is pinned UTC, window boundaries are
    epoch-aligned and the sink table equals the batch/oracle GROUP BY.
    At scale this is the continuous-ingest shape: state is one row per
    (open window x key), eviction driven by the watermark."""
    stream, schema = _table_stream(spark, sf_dir, "events")
    stream = _with_event_ts(stream, schema)
    windowed = windowed_event_counts(
        stream,
        event_time_col="event_ts",
        key_col="event_type",
        window_duration="1 day",
        watermark_delay="30 minutes",
    )
    sink = _run_to_memory(windowed, "stream_wincounts", "complete")
    return sink.select(
        F.unix_micros("window_start").alias("win_start_us"),
        F.unix_micros("window_end").alias("win_end_us"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


_STREAM_DEDUP_ORACLE = """
SELECT MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_dupes
FROM documents
GROUP BY 1
"""


@query("streaming_dedup_digests", oracle=_STREAM_DEDUP_ORACLE, tags=("streaming",))
def streaming_dedup_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming exact-dedup through the engine's state store:
    ``readStream`` over the documents parquet -> content digest ->
    watermarked ``dropDuplicates`` (streaming.arrivals.streaming_exact_dedup)
    -> append-mode memory sink; joined back against the batch table for
    per-digest duplicate counts. One emitted row per distinct digest is
    the streaming-dedup contract; the digest set and the dupe counts are
    deterministic (which physical duplicate won the within-batch race is
    not, so id columns stay out of the result)."""
    stream, _ = _table_stream(spark, sf_dir, "documents")
    stream = stream.withColumn(
        "arrival_ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    deduped = streaming_exact_dedup(
        stream,
        text_col="text",
        id_col="doc_id",
        event_time_col="arrival_ts",
        watermark_delay="1 hour",
    )
    sink = _run_to_memory(deduped, "stream_dedup", "append")
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.md5(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
        ).alias("content_hash")
    )
    counts = batch.groupBy("content_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dupes")
    )
    return sink.select("content_hash").join(counts, "content_hash")


_SESSION_GAP_US = 4 * 3600 * 1_000_000

# Boundary semantics: session_window treats [ts, ts+gap) as the event's
# window and merges overlaps, so a gap of EXACTLY 4h starts a new
# session — hence >= (the batch sessionize_events query uses a strict >
# lag rule; both are valid gap conventions, each matching its oracle).
_STREAM_SESSION_ORACLE = f"""
WITH ev AS (
    SELECT user_id, EPOCH_US(ts) AS ts_us FROM events
),
marked AS (
    SELECT user_id, ts_us,
           CASE WHEN ts_us - LAG(ts_us) OVER w >= {_SESSION_GAP_US}
                  OR LAG(ts_us) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sessioned AS (
    SELECT user_id, ts_us,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_SESSION_GAP_US} AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessioned
GROUP BY user_id, sid
"""


@query("streaming_session_windows", oracle=_STREAM_SESSION_ORACLE, tags=("streaming",))
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming gap-sessionization end to end through the
    engine: file-source readStream over events -> watermarked
    session_window aggregate per user (state = one open session per
    user, merged across micro-batches, watermark-evicted) ->
    complete-mode memory sink. The oracle restates merged-session
    semantics with the batch lag/running-sum construction; a session's
    end is last_event + gap by definition of the merge."""
    stream, schema = _table_stream(spark, sf_dir, "events")
    stream = _with_event_ts(stream, schema)
    sessions = session_window_stats(
        stream,
        event_time_col="event_ts",
        key_col="user_id",
        gap="4 hours",
        watermark_delay="30 minutes",
    )
    sink = _run_to_memory(sessions, "stream_sessions", "complete")
    return sink.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


_STATEFUL_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS key,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(FLOOR(value)) AS DOUBLE) AS value_total
FROM events
GROUP BY 1
"""


@query("streaming_stateful_running_stats", oracle=_STATEFUL_ORACLE, tags=("streaming",))
def streaming_stateful_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator end to end:
    applyInPandasWithState (streaming/stateful.py running_key_stats)
    keeps per-user (count, total) in the checkpointed state store and
    emits the updated row each micro-batch; the update-mode memory sink
    accumulates one row per (key, batch), so the FINAL state per key is
    the row with the max running count — which must equal the batch
    GROUP BY. The summed value is pre-floored to integers so the
    running float total is exact regardless of batch/partition
    arrival order (integer sums in double are associative below 2^53)."""
    stream, schema = _table_stream(spark, sf_dir, "events")
    stream = stream.select(
        F.col("user_id").cast("string").alias("user_key"),
        F.floor(F.col("value")).cast("double").alias("val_int"),
    )
    stats = running_key_stats(stream, key_col="user_key", value_col="val_int")
    sink = _run_to_memory(stats, "stream_stateful", "update")
    w = Window.partitionBy("key").orderBy(F.col("n_records").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "key",
            F.col("n_records").cast("bigint").alias("n_records"),
            F.col("value_total").cast("double").alias("value_total"),
        )
    )


# --- append-mode session windows with genuinely LATE data -----------------
#
# The complete-mode gate above proves the session MERGE; this gate proves
# the WATERMARK: eviction finalizes sessions and drops late rows. The
# backlog is four files forced through four ordered micro-batches
# (maxFilesPerTrigger=1; order pinned by mtime, FileStreamSource sorts by
# timestamp):
#
#   batch 0  a@10:00 a@10:05 b@10:02   -> open sessions; wm -> 09:35
#   batch 1  a@20:00                   -> wm -> 19:30 after the batch
#   batch 2  c@20:01 (spacer)          -> runs AT wm 19:30: evicts + emits
#            the expired early sessions; wm -> 19:31 after
#   batch 3  a@10:07 b@10:04 (LATE)    -> state already evicted and the
#            rows are behind the watermark: the engine MUST drop them
#            (observed as numRowsDroppedByWatermark = 2)
#
# The spacer batch pins the engine's real contract (verified against
# this Spark build): a late row arriving in the SAME batch that evicts
# its session still merges — drops are guaranteed only once the state
# is gone, i.e. from the next batch on. Production ingest always has
# that next batch; availableNow backlogs need the explicit spacer.
#
# Emitted = sessions whose end < final watermark: a [10:00, 11:05) n=2
# (NOT n=3 — the late a@10:07 dropped) and b [10:02, 11:02) n=1. The
# open a@20:00 / c@20:01 sessions (end > wm) stay in state, correctly
# unemitted in append mode. The oracle is the literal expected relation:
# the "computation" under test is the engine's late-data contract, whose
# expected output is closed-form.
_SESSION_LATE_ORACLE = """
SELECT * FROM (VALUES
    (EPOCH_US(TIMESTAMP '2026-01-01 10:00:00'),
     EPOCH_US(TIMESTAMP '2026-01-01 11:05:00'), 'a', CAST(2 AS BIGINT)),
    (EPOCH_US(TIMESTAMP '2026-01-01 10:02:00'),
     EPOCH_US(TIMESTAMP '2026-01-01 11:02:00'), 'b', CAST(1 AS BIGINT))
) t(session_start_us, session_end_us, skey, n_events)
"""

_LATE_BATCHES = [
    [("a", "2026-01-01 10:00:00"), ("a", "2026-01-01 10:05:00"),
     ("b", "2026-01-01 10:02:00")],
    [("a", "2026-01-01 20:00:00")],
    [("c", "2026-01-01 20:01:00")],
    [("a", "2026-01-01 10:07:00"), ("b", "2026-01-01 10:04:00")],
]


@query("streaming_session_late_data", oracle=_SESSION_LATE_ORACLE, tags=("streaming",))
def streaming_session_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode session windows under out-of-order arrival: the
    production ingest behavior the complete-mode gate cannot see. Four
    micro-batches (one file each, mtime-ordered) open sessions, advance
    the watermark 9 hours past them, let a spacer batch evict and emit
    the expired sessions, then deliver rows behind the watermark; the
    append sink must hold exactly the finalized early sessions with the
    late rows DROPPED (a count of 3 for key 'a' means eviction failed)
    and the still-open sessions unemitted. At scale this is the
    state-bound guarantee: watermark eviction is what keeps the session
    store finite under unbounded ingest."""
    import json
    import os

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tempfile.mkdtemp(prefix="late_sessions_src_")
    base_mtime = 1_700_000_000
    for i, batch in enumerate(_LATE_BATCHES):
        path = os.path.join(src, f"batch_{i}.json")
        with open(path, "w") as fh:
            for skey, ts in batch:
                fh.write(json.dumps({"skey": skey, "ts": ts}) + "\n")
        os.utime(path, (base_mtime + i, base_mtime + i))
    stream = (
        spark.readStream.schema("skey string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sessions = session_window_stats(
        stream,
        event_time_col="ts",
        key_col="skey",
        gap="1 hour",
        watermark_delay="30 minutes",
    )
    sink = _run_to_memory(sessions, "stream_session_late", "append")
    return sink.select(
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "skey",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


_ENRICH_ORACLE = """
SELECT e.event_id, e.event_type, n.n_name AS nation
FROM events e
JOIN customer c ON c.c_custkey = e.user_id + 1
JOIN nation n ON n.n_nationkey = c.c_nationkey
"""


@query("streaming_static_enrich", oracle=_ENRICH_ORACLE, tags=("streaming",))
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — the lookup-join shape of a production
    ingest: the event stream joins two BATCH dimension tables (customer,
    nation) per micro-batch. Both static sides are broadcast, so the
    enrich is a stateless map-side hash join inside each batch — no
    streaming state, no shuffle of the stream, append mode end to end;
    at 100 TB/day the cost stays one broadcast hash probe per event.
    The oracle is the identical batch join."""
    stream, _ = _table_stream(spark, sf_dir, "events")
    cust = F.broadcast(
        spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
    )
    nat = F.broadcast(
        spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", F.col("n_name").alias("nation")
        )
    )
    enriched = (
        stream.select("event_id", "event_type", "user_id")
        .join(cust, F.col("user_id") + F.lit(1) == F.col("c_custkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("event_id", "event_type", "nation")
    )
    sink = _run_to_memory(enriched, "stream_static_enrich", "append")
    return sink


_SS_JOIN_ORACLE = """
SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
       EPOCH_US(p.ts) - EPOCH_US(s.ts) AS delta_us
FROM events s
JOIN events p
  ON p.user_id = s.user_id
 AND s.event_type = 'signup' AND p.event_type = 'purchase'
 AND EPOCH_US(p.ts) >= EPOCH_US(s.ts)
 AND EPOCH_US(p.ts) <= EPOCH_US(s.ts) + 7200000000
"""


@query("streaming_stream_stream_join", oracle=_SS_JOIN_ORACLE, tags=("streaming",))
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join — the hardest streaming shape: the
    signup stream joins the purchase stream on user_id with an
    event-time range (purchase within 2h of signup), both sides
    watermarked so the join STATE is evicted once the other side can no
    longer match (the time-range condition is what lets Spark bound
    each side's buffer — without it state grows forever). Inner join,
    append mode; at scale the state store holds only the 2h+delay
    horizon per side. The oracle is the equivalent batch interval
    join."""
    s1, schema = _table_stream(spark, sf_dir, "events")
    s2, _ = _table_stream(spark, sf_dir, "events")
    sign = (
        _with_event_ts(s1, schema)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("event_ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    buy = (
        _with_event_ts(s2, schema)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("event_ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = sign.join(
        buy,
        (F.col("s_user") == F.col("b_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOURS")),
    ).select(
        "signup_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("delta_us"),
    )
    return _run_to_memory(joined, "stream_ss_join", "append")


_UPSERT_ORACLE = """
SELECT user_id, ts_us, event_id, event_type FROM (
    SELECT user_id, EPOCH_US(ts) AS ts_us, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY EPOCH_US(ts) DESC, event_id DESC) AS rn
    FROM events
) t WHERE rn = 1
"""


@query("streaming_upsert_snapshot", oracle=_UPSERT_ORACLE, tags=("streaming",))
def streaming_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: the event stream drains through a
    foreachBatch latest-wins upsert (streaming/upsert.py) into a keyed
    parquet snapshot — one row per user, the newest change by
    (ts, event_id) — and the snapshot read-back must equal the batch
    argmax the oracle computes. This is the sink half of a CDC
    pipeline: the merge is idempotent (re-delivered batches are no-ops,
    unit-pinned in tests/test_streaming_upsert.py), the snapshot swap
    is atomic, and exactly-once follows from checkpointed batch ids +
    idempotence rather than sink transactions. At warehouse scale the
    same merge keys a Delta/Iceberg MERGE commit; the per-batch cost is
    one key-shuffle argmax, no window, no per-key sort."""
    import os

    stream, schema = _table_stream(spark, sf_dir, "events")
    stream = _with_event_ts(stream, schema)
    proj = stream.select(
        "user_id",
        F.unix_micros("event_ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    base = tempfile.mkdtemp(prefix="upsert_")
    snap = os.path.join(base, "snapshot")
    ckpt = os.path.join(base, "ckpt")
    run_upsert_stream(
        proj, snap, ckpt, key_cols=["user_id"], order_cols=["ts_us", "event_id"]
    )
    return read_snapshot(spark, snap)


_HALF_DAY_US = _DAY_US // 2

_SLIDING_ORACLE = f"""
WITH covered AS (
    SELECT (EPOCH_US(ts) // {_HALF_DAY_US} - i) * {_HALF_DAY_US}
               AS win_start_us,
           event_type
    FROM events, UNNEST(GENERATE_SERIES(0, 1)) t(i)
)
SELECT win_start_us,
       win_start_us + {_DAY_US} AS win_end_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM covered
GROUP BY 1, 2, 3
"""


@query(
    "streaming_sliding_windows", oracle=_SLIDING_ORACLE, tags=("streaming",)
)
def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregate (1-day windows every 12 h):
    each event lands in exactly duration/slide = 2 overlapping windows
    — the physical difference from tumbling windows is a 2x row expand
    BEFORE the stateful aggregate, and 2x open-window state, which is
    the cost model for choosing slide at scale. The oracle replays the
    expansion arithmetically: window starts are the two half-day-
    aligned ticks at or before the event (floor-division — identical
    to Spark's window assignment for epoch-aligned UTC windows)."""
    stream, schema = _table_stream(spark, sf_dir, "events")
    stream = _with_event_ts(stream, schema)
    windowed = sliding_window_counts(
        stream,
        event_time_col="event_ts",
        key_col="event_type",
        window_duration="1 day",
        slide_duration="12 hours",
        watermark_delay="30 minutes",
    )
    sink = _run_to_memory(windowed, "stream_sliding", "complete")
    return sink.select(
        F.unix_micros("window_start").alias("win_start_us"),
        F.unix_micros("window_end").alias("win_end_us"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@query(
    "streaming_dedup_ttl_state",
    oracle=_STREAM_DEDUP_ORACLE,
    tags=("streaming",),
)
def streaming_dedup_ttl_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup via dropDuplicatesWithinWatermark
    (streaming.arrivals.streaming_dedup_within_watermark): digest state
    expires once the watermark passes its window, so the state store
    tracks the event-time window rather than the all-time digest domain
    — the only dedup shape whose state survives 100 TB of ingest. All
    test arrivals share one timestamp, so every duplicate is in-window
    and the emitted digest set equals exact dedup (the SAME oracle as
    streaming_dedup_digests — deliberately: the two queries pin that
    both state disciplines agree when duplicates cluster in time, which
    is the regime the TTL variant is correct for)."""
    from c3dc_etl_spark.streaming.arrivals import (
        streaming_dedup_within_watermark,
    )

    stream, _ = _table_stream(spark, sf_dir, "documents")
    stream = stream.withColumn(
        "arrival_ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    deduped = streaming_dedup_within_watermark(
        stream,
        text_col="text",
        id_col="doc_id",
        event_time_col="arrival_ts",
        watermark_delay="1 hour",
    )
    sink = _run_to_memory(deduped, "stream_dedup_ttl", "append")
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.md5(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
        ).alias("content_hash")
    )
    counts = batch.groupBy("content_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dupes")
    )
    return sink.select("content_hash").join(counts, "content_hash")


_OUTER_JOIN_ORACLE = """
SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
       EPOCH_US(p.ts) - EPOCH_US(s.ts) AS delta_us
FROM events s
LEFT JOIN events p
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase'
 AND EPOCH_US(p.ts) >= EPOCH_US(s.ts)
 AND EPOCH_US(p.ts) <= EPOCH_US(s.ts) + 7200000000
WHERE s.event_type = 'signup'
"""


@query(
    "streaming_outer_join_eviction",
    oracle=_OUTER_JOIN_ORACLE,
    tags=("streaming",),
)
def streaming_outer_join_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join: matched (signup, purchase-within-2h)
    pairs emit as they join, and an UNMATCHED signup emits null-padded
    only once the watermark proves no future purchase can match — the
    eviction-driven outer result that makes outer joins bounded-state.
    The backlog is three mtime-ordered micro-batches: the real events
    table, then two far-future sentinel batches whose only job is to
    advance BOTH sides' watermarks past every real row. Each sentinel
    batch carries one fake signup AND one fake purchase (negative user
    ids, so they can never join a real row): Catalyst pushes the type
    filters BELOW the EventTimeWatermark collector, so a sentinel must
    SURVIVE its side's filter to feed that side's watermark — a
    filtered-out sentinel leaves the global (min-policy) watermark
    stuck and no outer row ever flushes. And the sentinels must never
    THEMSELVES emit: any post-join filter on a left-side marker column
    would be pushed below that same watermark collector (re-killing the
    sentinel), so instead the sentinel SIGNUPS sit 30 days beyond the
    final watermark — they advance it but are never evicted, hence
    never null-padded — while the sentinel PURCHASES (the non-preserved
    side, never emitted unmatched) step forward by one day per batch to
    drive the eviction horizon past every real row. The second sentinel
    batch runs AT the advanced watermark and flushes the evicted outer
    rows (same engine contract as streaming_session_late_data's
    spacer). The
    oracle is the equivalent batch LEFT JOIN: parity proves every
    unmatched signup was flushed and no matched pair was double-emitted
    or null-padded."""
    import glob
    import os
    import shutil

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tempfile.mkdtemp(prefix="outer_join_src_")
    events = read_events_parquet(spark, f"{sf_dir}/events.parquet")
    # the real backlog must land as ONE micro-batch file: split across
    # batches, the per-batch watermark advance would DROP late-ordered
    # real rows mid-table and change the outer result. Test sf dirs
    # hold single-file parquet (byte copy); the x5 scale corpus holds
    # directory parquet (Spark write) — coalesce-rewrite to one file.
    events_path = f"{sf_dir}/events.parquet"
    if os.path.isfile(events_path):
        shutil.copy(events_path, os.path.join(src, "batch0.parquet"))
    else:
        tmp0 = tempfile.mkdtemp(prefix="outer_join_batch0_")
        events.coalesce(1).write.mode("overwrite").parquet(tmp0)
        part0 = glob.glob(os.path.join(tmp0, "part-*.parquet"))[0]
        shutil.move(part0, os.path.join(src, "batch0.parquet"))
        shutil.rmtree(tmp0, ignore_errors=True)
    schema = events.schema
    ts_is_long = dict(events.dtypes)["ts"] == "bigint"
    far = events.select(F.max("ts").alias("m")).first()["m"]
    def _shift(days: int):
        return (
            F.lit(far) + F.lit(days * 86_400_000_000_000)  # days of nanos
            if ts_is_long
            else F.lit(far) + F.expr(f"INTERVAL {days} DAYS")
        )

    for i in (1, 2):
        one = events.limit(1)
        sent = one.withColumn("ts", _shift(30)).withColumn(
            "event_type", F.lit("signup")
        ).withColumn("user_id", F.lit(-1).cast("bigint")).unionByName(
            one.withColumn("ts", _shift(i)).withColumn(
                "event_type", F.lit("purchase")
            ).withColumn("user_id", F.lit(-2).cast("bigint"))
        )
        tmp_out = tempfile.mkdtemp(prefix=f"outer_join_sentinel{i}_")
        sent.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"batch{i}.parquet"))
        shutil.rmtree(tmp_out, ignore_errors=True)
    base = 1_700_000_000
    for i in range(3):
        p = os.path.join(src, f"batch{i}.parquet")
        os.utime(p, (base + i, base + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "batch*.parquet")
        .parquet(src)
    )
    withts = _with_event_ts(stream, schema)
    # watermark BEFORE the type filter: sentinels advance it, then drop
    sign = (
        withts.withColumnRenamed("event_ts", "s_ts")
        .withWatermark("s_ts", "1 hour")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            "s_ts",
        )
    )
    withts2 = _with_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "batch*.parquet")
        .parquet(src),
        schema,
    )
    buy = (
        withts2.withColumnRenamed("event_ts", "p_ts")
        .withWatermark("p_ts", "1 hour")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            "p_ts",
        )
    )
    joined = sign.join(
        buy,
        (F.col("s_user") == F.col("b_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOURS")),
        "leftOuter",
    ).select(
        "signup_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("delta_us"),
    )
    return _run_to_memory(joined, "stream_outer_join", "append")


@query(
    "streaming_tablelog_upsert",
    oracle=_UPSERT_ORACLE,
    tags=("streaming", "tablelog"),
)
def streaming_tablelog_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply through the TRANSACTIONAL table log: every
    micro-batch collapses to latest-wins per user and lands as ONE
    copy-on-write MERGE commit carrying the (app, batch_id) txn action
    — a re-delivered batch (foreachBatch's at-least-once contract) is
    rejected by the log's own high-water mark IN the same atomic commit
    as the data, which is exactly-once by construction rather than by
    idempotence (the contrast with streaming_upsert_snapshot's
    swap-sink, whose exactly-once is checkpoint + no-op replay). The
    read-back snapshot must equal the batch argmax; crash/replay and
    foreign-writer conflict behavior are unit-pinned in
    tests/test_streaming_upsert.py (streaming/upsert.py:
    run_upsert_stream_tablelog)."""
    import os

    from c3dc_etl_spark.sink.tablelog import TableLog
    from c3dc_etl_spark.streaming.upsert import run_upsert_stream_tablelog

    stream, schema = _table_stream(spark, sf_dir, "events")
    stream = _with_event_ts(stream, schema)
    proj = stream.select(
        "user_id",
        F.unix_micros("event_ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    base = tempfile.mkdtemp(prefix="tl_upsert_")
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    run_upsert_stream_tablelog(
        proj, table, ckpt,
        key_cols=["user_id"], order_cols=["ts_us", "event_id"],
    )
    return TableLog(table).read(spark).select(
        "user_id", "ts_us", "event_id", "event_type"
    )


# Round-10 growth tier (r9 verdict item 7): stream-stream join under
# REAL late data. Two file sources advance in lockstep (availableNow,
# maxFilesPerTrigger=1 each, mtime-ordered):
#
#   batch 0  L x@10:00        R x@10:10   -> match emitted (10:10 in
#            [10:00, 11:00]); wm -> min(09:30, 09:40) = 09:30
#   batch 1  L adv@20:00      R adv2@20:05 (disjoint keys, no match)
#            -> wm -> min(19:30, 19:35) = 19:30 after the batch
#   batch 2  L spc@20:06      R spc2@20:07 (spacer): runs AT wm 19:30,
#            evicting both sides' 10:xx join state
#   batch 3  L x@10:05 (LATE) R x@10:15 (LATE): behind the watermark
#            with the matching state GONE — each would join batch 0's
#            other side if the engine failed to drop them (x@10:05
#            matches R's x@10:10; x@10:15 matches L's x@10:00)
#
# Same engine contract as streaming_session_late_data: a late row in
# the SAME batch that evicts its state still merges, so the spacer
# batch guarantees the drop. Expected sink: exactly the batch-0 pair.
_JOIN_LATE_ORACLE = """
SELECT * FROM (VALUES
    ('x', EPOCH_US(TIMESTAMP '2026-01-01 10:00:00'),
          EPOCH_US(TIMESTAMP '2026-01-01 10:10:00'))
) t(k, l_ts_us, r_ts_us)
"""

_JOIN_LATE_LEFT = [
    [("x", "2026-01-01 10:00:00")],
    [("adv", "2026-01-01 20:00:00")],
    [("spc", "2026-01-01 20:06:00")],
    [("x", "2026-01-01 10:05:00")],
]
_JOIN_LATE_RIGHT = [
    [("x", "2026-01-01 10:10:00")],
    [("adv2", "2026-01-01 20:05:00")],
    [("spc2", "2026-01-01 20:07:00")],
    [("x", "2026-01-01 10:15:00")],
]


def _batch_files(batches) -> str:
    """One JSON-lines file per batch with pinned mtimes (the file
    source orders by mtime then path, one file per trigger)."""
    import json
    import os

    src = tempfile.mkdtemp(prefix="stream_batches_")
    base_mtime = 1_700_000_000
    for i, batch in enumerate(batches):
        path = os.path.join(src, f"batch_{i}.json")
        with open(path, "w") as fh:
            for key, ts in batch:
                fh.write(json.dumps({"k": key, "ts": ts}) + "\n")
        os.utime(path, (base_mtime + i, base_mtime + i))
    return src


@query("streaming_join_late_drop", oracle=_JOIN_LATE_ORACLE, tags=("streaming",))
def streaming_join_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join under REAL late data:
    rows arriving behind the watermark after the matching state was
    evicted in a prior batch must be DROPPED — even though each late
    row has a genuine partner in the other stream's history. This is
    the state-bound guarantee that lets the join buffer stay finite at
    100 TB/day: without the drop, correctness would require unbounded
    state. Inner join, append mode; the sink must hold exactly the
    on-time match."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    left = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(_batch_files(_JOIN_LATE_LEFT))
        .select(
            F.col("k"), F.col("ts").alias("l_ts")
        )
        .withWatermark("l_ts", "30 minutes")
    )
    right = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(_batch_files(_JOIN_LATE_RIGHT))
        .select(
            F.col("k").alias("r_k"), F.col("ts").alias("r_ts")
        )
        .withWatermark("r_ts", "30 minutes")
    )
    joined = left.join(
        right,
        (F.col("k") == F.col("r_k"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "k",
        F.unix_micros("l_ts").alias("l_ts_us"),
        F.unix_micros("r_ts").alias("r_ts_us"),
    )
    return _run_to_memory(joined, "stream_join_late", "append")


# Round-11 growth tier (r10 verdict item 5c): windowed aggregation
# streamed INTO the transactional table log with exactly-once epochs —
# T200's CDC-commit machinery (txn high-water mark in the same atomic
# commit as the data) composed with the watermarked windowed aggregate,
# i.e. the incrementally-maintained aggregate table a 100 TB event
# stream feeds. Update output mode means each epoch merges exactly the
# CHANGED windows; the final table must equal the batch GROUP BY.
_AGG_SINK_ORACLE = f"""
SELECT (EPOCH_US(ts) // {_DAY_US}) * {_DAY_US} AS win_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_users
FROM events
GROUP BY 1, 2
"""


@query(
    "streaming_agg_tablelog_sink",
    oracle=_AGG_SINK_ORACLE,
    tags=("streaming", "tablelog"),
)
def streaming_agg_tablelog_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed aggregate -> transactional MERGE sink: 1-day
    tumbling windows per event_type (30 min watermark) run in UPDATE
    mode through foreachBatch, each epoch landing as ONE copy-on-write
    merge commit keyed by the window surrogate and carrying the (app,
    batch_id) txn action — a re-delivered epoch is rejected by the
    log's own high-water mark in the same atomic commit as the data
    (exactly-once by construction). The read-back through the log must
    equal the batch GROUP BY; multi-epoch window updates, crash/replay
    no-ops, and manual re-delivery rejection are unit-pinned in
    tests/test_streaming_upsert.py (streaming/upsert.py:
    run_windowed_agg_stream_tablelog)."""
    import os

    from c3dc_etl_spark.sink.tablelog import TableLog
    from c3dc_etl_spark.streaming.upsert import run_windowed_agg_stream_tablelog

    stream, schema = _table_stream(spark, sf_dir, "events")
    withts = _with_event_ts(stream, schema)
    # count + integer sum: both incrementally maintainable in update
    # mode AND cross-engine exact (streaming aggs cannot do DISTINCT)
    agg = (
        withts.withWatermark("event_ts", "30 minutes")
        .groupBy(F.window("event_ts", "1 day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("user_id").cast("bigint").alias("sum_users"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_users",
        )
        .withColumn(
            "k",
            F.concat(
                F.col("win_start_us").cast("string"),
                F.lit(":"),
                F.col("event_type"),
            ),
        )
    )
    base = tempfile.mkdtemp(prefix="agg_sink_")
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    run_windowed_agg_stream_tablelog(agg, table, ckpt, key_col="k")
    return TableLog(table).read(spark).select(
        "win_start_us", "event_type", "n_events", "sum_users"
    )
