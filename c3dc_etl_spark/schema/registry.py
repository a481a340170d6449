"""SchemaRegistry: the engine's compiled view of the data model.

Turns the model (or an external JSON-Schema bundle of the same shape the
reference generates — one $defs entry per node; schema/schema_creator.py:
244-339) into what the compiler and validators need:

- per-node Spark ``StructType`` (string/long/double/array<string>),
- per-property enum PV lists and lower->PV restoration maps,
- enum code->PV maps from 'CODE : TERM' prefixes
  (etl/target/c3dc_etl.py:431-437),
- required-property sets, id fields, pluralized names,
- relationship link fields both directions (scalar to parent, array to
  children; schema/schema_creator.py:404-419).

All of these are tiny driver-side dicts; they reach executors inside
compiled Column literals (constant-folded) — never via per-row lookups.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from c3dc_etl_spark.schema.model import (
    MODEL,
    OBSERVATION_NODES,
    RELATIONSHIPS,
    NodeDef,
    PropDef,
    RelationshipDef,
)

_SPARK_TYPES = {
    "string": StringType(),
    "integer": LongType(),
    "number": DoubleType(),
    "array": ArrayType(StringType(), containsNull=False),
}

CODE_TERM_SEPARATOR = " : "


@dataclass(frozen=True)
class LinkField:
    """An id-valued relationship property, e.g. participant records carry
    `consent_group.consent_group_id` (scalar) and consent_group records
    carry `participant.participant_id` (array)."""

    field_name: str
    remote_node: str
    is_array: bool


class SchemaRegistry:
    def __init__(
        self,
        model: dict[str, NodeDef] | None = None,
        relationships: tuple[RelationshipDef, ...] | None = None,
    ):
        self.model = model or MODEL
        self.relationships = relationships or RELATIONSHIPS
        self._links: dict[str, list[LinkField]] = {n: [] for n in self.model}
        for rel in self.relationships:
            # child points at parent (to-one scalar)
            self._links[rel.child].append(
                LinkField(f"{rel.parent}.{rel.parent}_id", rel.parent, False)
            )
            # parent points at children (to-many array)
            self._links[rel.parent].append(
                LinkField(f"{rel.child}.{rel.child}_id", rel.child, True)
            )

    # -- lookups -----------------------------------------------------------
    def node(self, name: str) -> NodeDef:
        return self.model[name]

    @property
    def node_names(self) -> list[str]:
        return list(self.model)

    def prop(self, node: str, prop: str) -> PropDef:
        for p in self.model[node].props:
            if p.name == prop:
                return p
        raise KeyError(f"{node}.{prop} is not in the schema")

    def required_props(self, node: str) -> list[str]:
        return [p.name for p in self.model[node].props if p.required]

    def enum_values(self, node: str, prop: str) -> tuple[str, ...]:
        return self.prop(node, prop).enum

    def enum_code_map(self, node: str, prop: str) -> dict[str, str]:
        """'CODE : TERM' PVs -> {code: full PV} for {find_enum_value}."""
        out: dict[str, str] = {}
        for pv in self.enum_values(node, prop):
            if CODE_TERM_SEPARATOR in pv:
                code = pv.split(CODE_TERM_SEPARATOR, 1)[0].strip()
                out[code.casefold()] = pv
        return out

    def links(self, node: str) -> list[LinkField]:
        return list(self._links[node])

    def observation_nodes(self) -> tuple[str, ...]:
        return OBSERVATION_NODES

    # -- Spark schema ------------------------------------------------------
    def struct_type(self, node: str, *, include_links: bool = True) -> StructType:
        fields = [
            StructField(p.name, _SPARK_TYPES[p.type], nullable=not p.required)
            for p in self.model[node].props
        ]
        if include_links:
            for link in self._links[node]:
                t = ArrayType(StringType(), containsNull=False) if link.is_array else StringType()
                fields.append(StructField(link.field_name, t, nullable=True))
        return StructType(fields)

    # -- JSON Schema (X1 oracle shape) ------------------------------------
    def to_json_schema(self) -> dict:
        """Draft-2020-12 bundle: one $defs entry per node plus a root
        `nodes` container of arrays — the same output contract as the
        reference's schema_creator (schema/schema_creator.py:244-349,
        additionalProperties: false, required from Req flags)."""
        defs: dict[str, dict] = {}
        for name, node in self.model.items():
            props: dict[str, dict] = {}
            for p in node.props:
                if p.type == "array":
                    item: dict = {"type": "string"}
                    if p.enum:
                        item["enum"] = list(p.enum)
                    props[p.name] = {"type": "array", "items": item, "uniqueItems": True}
                else:
                    spec: dict = {"type": p.type}
                    if p.enum:
                        spec["enum"] = list(p.enum)
                    if p.maximum is not None:
                        spec["maximum"] = p.maximum
                    if p.minimum is not None:
                        spec["minimum"] = p.minimum
                    props[p.name] = spec
            for link in self._links[name]:
                props[link.field_name] = (
                    {"type": "array", "items": {"type": "string"}, "uniqueItems": True}
                    if link.is_array
                    else {"type": "string"}
                )
            defs[name] = {
                "type": "object",
                "properties": props,
                "required": [p.name for p in node.props if p.required],
                "additionalProperties": False,
            }
        return {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$defs": defs,
            "type": "object",
            "properties": {
                self.model[n].plural: {"type": "array", "items": {"$ref": f"#/$defs/{n}"}}
                for n in self.model
            },
            "additionalProperties": False,
        }

    def save_json_schema(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.to_json_schema(), f, indent=2)

    @classmethod
    def from_json_schema(cls, doc: dict) -> "SchemaRegistry":
        """Load an external bundle of the generated shape (inverse of
        to_json_schema): rebuilds NodeDefs; relationship links are
        recognized by their `<node>.<node>_id` field names."""
        defs = doc["$defs"]
        model: dict[str, NodeDef] = {}
        rels: list[RelationshipDef] = []
        for name, spec in defs.items():
            props: list[PropDef] = []
            required = set(spec.get("required", ()))
            for pname, pspec in spec.get("properties", {}).items():
                if "." in pname:  # link field, e.g. participant.participant_id
                    remote = pname.split(".", 1)[0]
                    if pspec.get("type") == "array" and remote in defs:
                        rels.append(RelationshipDef(name, remote))
                    continue
                ptype = pspec.get("type", "string")
                enum = tuple(
                    pspec.get("enum") or pspec.get("items", {}).get("enum", ()) or ()
                )
                props.append(
                    PropDef(
                        pname,
                        ptype,
                        enum=enum,
                        required=pname in required,
                        maximum=pspec.get("maximum"),
                        minimum=pspec.get("minimum"),
                    )
                )
            model[name] = NodeDef(name, tuple(props))
        return cls(model, tuple(rels))
