"""Mapping unpivoter (R3) + reference-file self-hash entries (R4).

Reference mapping_unpivoter/mapping_unpivoter.py: the rules workbook has
one ROW per (output_field, replacement pair); unpivoting groups rows
into the per-output-field mapping objects the ETL consumes
(unpivot_transformation_mappings :221-305, _unpivot_mapping :463-500),
deduplicating repeated (old, new) pairs (:280-295), JSON-parsing
"quoted" cells, and checking default-value consistency across a field's
rows. update_reference_file_mappings (:307-427) stamps file size/md5
into the config — self-referentially, with its own fields zeroed first.

Rows arrive as header-keyed dicts (from read_delimited/read_worksheet
collect — rule sheets are config-sized).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterable

OUTPUT_FIELD_COL = "Target Variable Name"
SOURCE_FIELD_COL = "Source Variable Name"
TGI_COL = "Type Group Index"
DEFAULT_COL = "Default Value If Null/Blank"
OLD_COL = "Source Permissible Values Term"
NEW_COL = "Target Permissible Values Term"
REPLACEMENT_VALUES_COL = "Replacement Values"


def _cell(row: dict, col: str) -> str:
    v = row.get(col)
    return "" if v is None else str(v).strip()


def _parse_quoted(value: str) -> object:
    """A '"quoted"' cell is JSON (lists, numbers, escaped strings) —
    reference :472-479."""
    if value.startswith('"') and value.endswith('"') and len(value) >= 2:
        try:
            return json.loads(value)
        except json.JSONDecodeError:
            return value
    return value


def unpivot_transformation_mappings(rows: Iterable[dict]) -> list[dict]:
    """Rule rows -> mapping JSON objects, grouped by (output_field,
    type_group_index) in first-appearance order."""
    grouped: dict[tuple[str, str], dict] = {}
    for row in rows:
        out_field = _cell(row, OUTPUT_FIELD_COL)
        if not out_field:
            continue
        tgi = _cell(row, TGI_COL) or "*"
        key = (out_field, tgi)
        m = grouped.setdefault(
            key,
            {
                "output_field": out_field,
                "source_field": _cell(row, SOURCE_FIELD_COL),
                "type_group_index": tgi,
                "default_value": None,
                "replacement_values": [],
                "_seen_pairs": set(),
            },
        )
        if _cell(row, SOURCE_FIELD_COL) and m["source_field"] != _cell(row, SOURCE_FIELD_COL):
            raise ValueError(
                f"{out_field}: conflicting source fields "
                f"{m['source_field']!r} vs {_cell(row, SOURCE_FIELD_COL)!r}"
            )
        default = _cell(row, DEFAULT_COL)
        if default:
            parsed = _parse_quoted(default)
            if m["default_value"] not in (None, parsed):
                raise ValueError(f"{out_field}: conflicting default values")
            m["default_value"] = parsed
        # a pre-collated JSON replacement-values cell merges wholesale
        rv_cell = _cell(row, REPLACEMENT_VALUES_COL)
        pairs: list[tuple[object, object]] = []
        if rv_cell:
            for rv in json.loads(rv_cell):
                pairs.append((rv.get("old_value", "*"), rv.get("new_value")))
        elif _cell(row, OLD_COL) or _cell(row, NEW_COL):
            pairs.append(
                (_parse_quoted(_cell(row, OLD_COL)) or "*", _parse_quoted(_cell(row, NEW_COL)))
            )
        for old, new in pairs:
            pair_key = (json.dumps(old), json.dumps(new))
            if pair_key in m["_seen_pairs"]:
                continue  # D5: duplicate pair dedupe
            m["_seen_pairs"].add(pair_key)
            m["replacement_values"].append({"old_value": old, "new_value": new})
    out = []
    for m in grouped.values():
        m.pop("_seen_pairs")
        if m["default_value"] is None:
            m.pop("default_value")
        if not m["replacement_values"]:
            m.pop("replacement_values")
        out.append(m)
    return out


def reference_file_entries(paths: Iterable[str]) -> list[dict]:
    """R4: {file_name, file_size, md5sum} per config artifact. The
    reference's self-referential variant (the mapping file hashing
    itself with its own size/md5 fields zeroed) applies when a listed
    path IS the output config; callers zero those fields before calling
    and splice the result in — kept driver-side and explicit."""
    out = []
    for path in paths:
        h = hashlib.md5()
        size = 0
        with open(path, "rb") as f:
            while chunk := f.read(1 << 20):
                h.update(chunk)
                size += len(chunk)
        out.append(
            {
                "file_name": path.rsplit("/", 1)[-1],
                "file_size": size,
                "md5sum": h.hexdigest(),
            }
        )
    return out
