"""Warehouse-layer operators: SCD Type-2 dimension builds, count-min
heavy-hitter sketches, Z-order (Morton) layout keys for multi-column
data skipping, and blocked record linkage.

These extend the reference's harmonize/merge surface (etl/*/c3dc_etl.py
builds point-in-time snapshots only) with the temporal-versioning,
sketching, and layout operations a 100 TB warehouse needs. Everything is
declarative DataFrame expression code — no UDFs, no driver loops; the
only driver traffic any of these require is a bounded 1-row stats
collect by the caller (key maxima for layout bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    attr_col: str,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 build from a change log: collapse
    consecutive runs of the same ``attr_col`` value per ``key_col`` into
    versioned rows with ``[eff_from, eff_to)`` validity and an
    ``is_current`` flag on the open-ended latest version.

    Plan shape: ONE exchange on ``key_col``; the change-detection LAG,
    the post-filter LEAD, and the version ROW_NUMBER all share that
    partitioning (Catalyst plans the second window without a new
    shuffle because the filter preserves the distribution). Per-key
    state is the key's own history — no global sort, no driver state —
    so the build scales with the widest single entity, not the table.
    ``tiebreak_col`` must make (key, ts, tiebreak) unique or versions
    would be nondeterministic under equal timestamps.

    Change detection is null-safe: ``a -> NULL -> b`` produces three
    versions (the NULL period is a real version, IS DISTINCT FROM
    semantics — SQL mirrors must use ``IS DISTINCT FROM``, not ``!=``).
    A lag'd constant marks the first event per key, so a leading NULL
    attr value cannot be confused with "no previous row".
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    marked = df.withColumn("__prev", F.lag(attr_col).over(w)).withColumn(
        "__has_prev", F.lag(F.lit(1)).over(w)
    )
    changes = marked.filter(
        F.col("__has_prev").isNull()
        | ~F.col("__prev").eqNullSafe(F.col(attr_col))
    )
    return changes.select(
        key_col,
        F.row_number().over(w).cast("bigint").alias("version"),
        attr_col,
        F.col(ts_col).alias("eff_from"),
        F.lead(ts_col).over(w).alias("eff_to"),
        F.lead(ts_col).over(w).isNull().cast("int").alias("is_current"),
    )


def hash_bucket(col: Column, salt: Column | str, width: int) -> Column:
    """Deterministic cross-engine hash bucket in [0, width): the
    project's single md5 fold (operators.dedup.hash32 — one definition
    so every operator's bucket/shard assignment agrees) over
    ``salt:value``, mod width. DuckDB mirror:
    ``CAST(CONCAT('0x', SUBSTR(MD5(salt || ':' || v), 1, 8)) AS BIGINT)
    % width`` — NULL-propagating on both sides: a NULL item yields a
    NULL bucket (``||`` is null-propagating in SQL and ``F.concat``
    matches), never a silent collision with the bare-salt bucket."""
    from c3dc_etl_spark.operators.dedup import hash32

    s = F.lit(salt) if isinstance(salt, str) else salt
    return F.pmod(
        hash32(F.concat(s, F.lit(":"), col.cast("string"))), F.lit(width)
    )


def cms_sketch(
    items: DataFrame,
    item_col: str,
    *,
    depth: int,
    width: int,
) -> DataFrame:
    """Count-min sketch of an item stream: ``depth`` independent hash
    rows x ``width`` buckets -> (depth_i, bucket, cell_count). The
    sketch is ``depth * width`` cells REGARDLESS of input size, built in
    one pass: each item contributes one increment per depth row (a
    ``depth``-way in-plan fan-out, still narrow), and the single
    exchange aggregates on (depth, bucket) — at most depth*width groups,
    so map-side partial aggregation collapses almost everything before
    the shuffle. Cells are additive: shard sketches merge by summing
    cell counts, which is what makes this the 100 TB cardinality-bounded
    frequency structure (Cormode & Muthukrishnan 2005)."""
    rows = items.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_i"),
        F.col(item_col).alias("__item"),
    )
    return (
        rows.select(
            "depth_i",
            hash_bucket(
                F.col("__item"), salt=F.concat(F.lit("cms"), F.col("depth_i").cast("string")), width=width
            ).alias("bucket"),
        )
        .groupBy("depth_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    *,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch for each probe item: min over the depth
    rows of the probed cells — the count-min estimate, guaranteed >= the
    true count (all error is overestimate from collisions). The sketch
    side is depth*width rows, so the probe join is a broadcast hash
    join; output one row per probe with ``est_count``.

    The sketch stores only non-empty cells, so the probe join is LEFT
    with absent cells counting as zero — a probe item none of whose
    cells were ever incremented estimates 0 (and still yields a row),
    and one with any empty cell estimates 0, as the true count-min
    min-over-rows requires."""
    probe_cells = probes.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("depth_i"),
    ).select(
        item_col,
        "depth_i",
        hash_bucket(
            F.col(item_col), salt=F.concat(F.lit("cms"), F.col("depth_i").cast("string")), width=width
        ).alias("bucket"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["depth_i", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cell_count"), F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


def morton_key(x: Column, y: Column, *, bits: int = 8) -> Column:
    """Morton (Z-order) interleave of two ``bits``-bit bucket ids into a
    single ``2*bits``-bit layout key: x occupies the even bit positions,
    y the odd. Rows sorted by this key cluster in BOTH dimensions at
    once, so block-level min/max stats (parquet row groups, file
    footers) prune 2-D box predicates that a single-column sort can
    only prune on its leading key.

    Pure bit arithmetic (shift/and/or) — whole-stage-codegen'd, and
    expressible identically in any engine for oracle parity."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(xb, 2 * i)).bitwiseOR(
            F.shiftleft(yb, 2 * i + 1)
        )
    return out


def morton_key_sql(x_expr: str, y_expr: str, *, bits: int = 8) -> str:
    """ANSI/DuckDB SQL string computing the same Morton key as
    :func:`morton_key` — generated from the same bit positions so the
    two can never drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def block_skipping_stats(
    df: DataFrame,
    block_col: str,
    x_col: str,
    y_col: str,
    *,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    layout: str,
) -> DataFrame:
    """Block-level data-skipping measurement for a physical layout:
    group rows into their layout blocks (``block_col`` = a key-prefix
    block id — the declarative stand-in for a parquet row group under
    ``repartitionByRange(layout_key).sortWithinPartitions``), compute
    each block's min/max envelope on both dimensions, and report how
    many blocks a 2-D box predicate must touch vs skip — the exact
    arithmetic a parquet reader does against row-group statistics.

    One exchange (the groupBy on block id), then a scalar aggregate over
    |blocks| rows. ``rows_touched`` is the I/O proxy: rows living in
    blocks whose envelope intersects the box."""
    blocks = df.groupBy(F.col(block_col).alias("block_id")).agg(
        F.min(x_col).alias("min_x"),
        F.max(x_col).alias("max_x"),
        F.min(y_col).alias("min_y"),
        F.max(y_col).alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    touched = (
        (F.col("max_x") >= x_lo)
        & (F.col("min_x") <= x_hi)
        & (F.col("max_y") >= y_lo)
        & (F.col("min_y") <= y_hi)
    ).cast("int")
    return blocks.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).alias("blocks_total"),
        F.sum(touched).cast("bigint").alias("blocks_touched"),
        F.sum(F.col("n_rows") * touched).cast("bigint").alias("rows_touched"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
    )


def blocked_linkage_pairs(
    records: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block_col: str,
    max_edit_distance: int,
    block_cap: int | None = None,
) -> DataFrame:
    """Blocked record linkage: candidate pairs are generated ONLY within
    a block (equi-join on the blocking key — a shuffle hash join, never
    a cross product), ordered ``id < id`` so each unordered pair is
    emitted exactly once, then scored with THRESHOLDED Levenshtein edit
    distance. Returns one row per candidate pair with its distance and a
    match flag.

    ``edit_distance`` uses the 3-arg bounded form: the exact distance
    when it is <= ``max_edit_distance``, else the sentinel ``-1`` — the
    banded DP costs O(len * threshold) per pair instead of O(len^2)
    (the same fix that took the Ed-Join verify 37x cheaper on long
    strings in r8). ``is_match`` is therefore ``edit_distance >= 0``;
    callers that need unbounded distances should score separately.

    Scale: the quadratic compare is confined to each block, so cost is
    sum(|block|^2); the blocking key must be designed so block size
    stays bounded as the corpus grows (compose attributes — never a
    fixed-cardinality key alone). ``block_cap`` is the skew guard: when
    set, blocks holding more than ``block_cap`` rows are DROPPED before
    pairing via ``operators.dedup.drop_oversized_groups`` (map-side
    combined count + anti-join, no hot-key window) — the same
    discipline as the LSH band caps."""
    if block_cap is not None:
        from c3dc_etl_spark.operators.dedup import drop_oversized_groups

        records = drop_oversized_groups(records, [block_col], block_cap)
    a = records.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = records.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("__blk").alias("block_key"),
            "id_a",
            "id_b",
            F.levenshtein(
                "name_a", "name_b", int(max_edit_distance)
            ).alias("edit_distance"),
        )
        .withColumn(
            "is_match",
            (F.col("edit_distance") >= 0).cast("int"),
        )
    )


def delta_join_agg_view(
    fact0: DataFrame,
    dfact: DataFrame,
    dim0: DataFrame,
    ddim: DataFrame,
    join_key: str,
    group_keys: list[str],
    measure_dec: Column,
    *,
    sign_col: str = "__sign",
) -> DataFrame:
    """Incremental maintenance of a join-aggregate view under signed
    deltas on BOTH join sides (the bilinear delta rule of incremental
    view maintenance — Gupta & Mumick's change propagation, the shape
    DBSP/differential dataflow generalize): for V = γ(F ⋈ D),

        ΔV = γ(ΔF ⋈ D0) + γ(F0 ⋈ ΔD) + γ(ΔF ⋈ ΔD)

    with row multiplicities carried as a ±1 ``sign_col`` on the delta
    frames (an UPDATE is a −1 old row plus a +1 new row) and signs
    MULTIPLYING through the ΔF ⋈ ΔD interaction term. The maintained
    view merges the stored base aggregate with the grouped signed
    delta by full-outer coalesce; groups whose row count drains to
    zero are retracted (dropped), so deletes fully reverse inserts.

    Returns (group_keys..., n_rows bigint, measure decimal sum) — the
    measure stays DECIMAL here so the merge is exact and
    order-independent; callers cast for display.

    Scale shape: the three delta terms scan only |Δ|-sized frames (a
    pushed-filter read of the changelog, never the stored fact), the
    dimension side of each term broadcasts, and the final merge is
    keyspace-sized — maintenance cost is O(|Δ| + |keyspace|)
    regardless of fact cardinality, which is the entire point of IVM
    at 100 TB. ``fact0`` is consumed once for the demo's base
    aggregate; a production deployment reads V0 from the stored view
    (e.g. the table log) instead."""
    sgn = F.col(sign_col)
    v0 = fact0.join(dim0, join_key).groupBy(*group_keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(measure_dec).alias("__m"),
    )
    terms = [
        dfact.join(dim0, join_key).select(*group_keys, sgn, measure_dec.alias("__v")),
        fact0.withColumn(sign_col, F.lit(1))
        .join(ddim.withColumnRenamed(sign_col, "__dsign"), join_key)
        .select(*group_keys, (sgn * F.col("__dsign")).alias(sign_col), measure_dec.alias("__v")),
        dfact.withColumnRenamed(sign_col, "__fsign")
        .join(ddim.withColumnRenamed(sign_col, "__dsign"), join_key)
        .select(
            *group_keys,
            (F.col("__fsign") * F.col("__dsign")).alias(sign_col),
            measure_dec.alias("__v"),
        ),
    ]
    delta = terms[0].unionByName(terms[1]).unionByName(terms[2])
    dv = delta.groupBy(*group_keys).agg(
        F.sum(sgn).cast("bigint").alias("__dn"),
        F.sum(sgn.cast("decimal(18,2)") * F.col("__v").cast("decimal(18,2)")).alias("__dm"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    merged = v0.join(dv, group_keys, "full_outer").select(
        *group_keys,
        (F.coalesce("__n", F.lit(0)) + F.coalesce("__dn", F.lit(0))).alias("n_rows"),
        (
            F.coalesce(F.col("__m"), zero) + F.coalesce(F.col("__dm"), zero)
        ).alias("measure_sum"),
    )
    return merged.filter(F.col("n_rows") > 0)
