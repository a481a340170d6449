"""D1: canonical record fingerprint with per-node id-blanking.

Reference get_cacheable_record (etl/target/c3dc_etl.py:278-329):
deep-copy the record, blank its own ``<node>_id``, blank every
relationship id property (participant: observation arrays; study:
consent_group/reference_file arrays; consent_group: participant array),
blank per-node volatile extras (reference_file.dcf_indexd_guid),
recursively sort keys/arrays, then hash the canonical JSON.

Engine form: a Column expression — props in sorted-name order (the
recursive key sort), arrays sorted and joined, nulls mapped to a
sentinel, 0x1f-joined and md5'd (md5 in place of the reference's sha1:
engine-portable, digest choice is not part of the semantics). Volatile
fields are EXCLUDED rather than blanked — identical effect on equality,
fewer bytes hashed. Pure codegen, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

from c3dc_etl_spark.schema.registry import SchemaRegistry

# per-node volatile extras beyond the id/link fields
# (reference_file.dcf_indexd_guid: etl/target/c3dc_etl.py:300-303)
DEFAULT_VOLATILE: dict[str, tuple[str, ...]] = {
    "reference_file": ("dcf_indexd_guid",),
}

NULL_SENTINEL = "<null>"


def canonical_fingerprint(
    node: str,
    registry: SchemaRegistry,
    *,
    frame_columns: Iterable[str],
    extra_volatile: Iterable[str] = (),
) -> Column:
    """Content fingerprint of a ``node`` record over the columns present
    in the frame. Two records with the same payload but different
    volatile ids (own id, link ids, per-node extras) hash identically."""
    node_def = registry.node(node)
    cols = set(frame_columns)
    volatile = {node_def.id_field, *DEFAULT_VOLATILE.get(node, ()), *extra_volatile}
    parts: list[Column] = []
    for p in sorted(node_def.props, key=lambda p: p.name):
        if p.name in volatile or p.name not in cols:
            continue
        c = F.col(p.name)
        if p.type == "array":
            parts.append(
                F.coalesce(F.array_join(F.array_sort(c), ";"), F.lit(NULL_SENTINEL))
            )
        else:
            parts.append(F.coalesce(c.cast("string"), F.lit(NULL_SENTINEL)))
    if not parts:
        raise ValueError(f"no non-volatile {node} properties present in the frame")
    return F.md5(F.concat_ws("\x1f", *parts))
