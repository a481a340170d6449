"""Relationship id wiring (R5/J1).

Reference wires parent/child id links with per-participant Python scans
(etl/ccdi/c3dc_etl.py:1340-1356,1457-1472 — O(participants x
observations)). Engine form: the child frame already carries its
to-parent scalar (`<parent>.<parent>_id`); the parent's to-many array is
ONE groupBy(collect_list) per relationship, sorted for deterministic
output (O2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from c3dc_etl_spark.schema.registry import SchemaRegistry


def child_id_arrays(
    child_df: DataFrame,
    child_node: str,
    parent_node: str,
    registry: SchemaRegistry,
) -> DataFrame:
    """(parent_id, sorted array of child ids) for one relationship —
    join this onto the parent frame to populate its
    `<child>.<child>_id` array property."""
    child_id = registry.node(child_node).id_field
    parent_link = f"{parent_node}.{parent_node}_id"
    return (
        child_df.select(
            F.col(f"`{parent_link}`").alias("__parent_id"),
            F.col(child_id).alias("__child_id"),
        )
        .filter(F.col("__parent_id").isNotNull())
        .groupBy("__parent_id")
        .agg(F.array_sort(F.collect_list("__child_id")).alias("__child_ids"))
    )


def wire_links(
    frames: dict[str, DataFrame], registry: SchemaRegistry
) -> dict[str, DataFrame]:
    """Populate every parent frame's to-many link arrays from the child
    frames present. Children keep their scalar to-parent links as-is.
    One small shuffle per (parent, child) pair; arrays sorted."""
    out = dict(frames)
    for node, df in frames.items():
        for link in registry.links(node):
            if not link.is_array or link.remote_node not in frames:
                continue
            child_df = frames[link.remote_node]
            parent_link = f"{node}.{node}_id"
            if parent_link not in child_df.columns:
                continue
            arrays = child_id_arrays(child_df, link.remote_node, node, registry)
            id_field = registry.node(node).id_field
            joined = out[node].join(
                arrays, F.col(id_field) == F.col("__parent_id"), "left"
            )
            out[node] = joined.withColumn(
                link.field_name, F.coalesce(F.col("__child_ids"), F.array())
            ).drop("__parent_id", "__child_ids")
    return out
