"""SchemaRegistry round-trips (S12) + type-group ordering (O6)."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, LongType, StringType

from c3dc_etl_spark.mapping.compiler import type_groups
from c3dc_etl_spark.mapping.model import FieldMapping
from c3dc_etl_spark.schema.registry import SchemaRegistry


def test_json_schema_round_trip():
    reg = SchemaRegistry()
    doc = reg.to_json_schema()
    back = SchemaRegistry.from_json_schema(doc)
    assert set(back.node_names) == set(reg.node_names)
    for node in reg.node_names:
        assert back.required_props(node) == reg.required_props(node), node
        for p in reg.node(node).props:
            bp = back.prop(node, p.name)
            assert bp.type == p.type and tuple(bp.enum) == tuple(p.enum), (node, p.name)
            assert bp.maximum == p.maximum and bp.minimum == p.minimum
        # relationship links rebuilt from the `<node>.<node>_id` fields
        assert {(l.field_name, l.is_array) for l in back.links(node)} == {
            (l.field_name, l.is_array) for l in reg.links(node)
        }


def test_struct_type_maps_model_types():
    reg = SchemaRegistry()
    st = reg.struct_type("diagnosis", include_links=True)
    fields = {f.name: f for f in st.fields}
    assert isinstance(fields["diagnosis"].dataType, StringType)
    assert isinstance(fields["age_at_diagnosis"].dataType, LongType)
    assert isinstance(fields["anatomic_site"].dataType, ArrayType)
    assert isinstance(fields["participant.participant_id"].dataType, StringType)
    assert not fields["diagnosis"].nullable  # required


def test_enum_code_map_extracts_prefixes():
    reg = SchemaRegistry()
    m = reg.enum_code_map("diagnosis", "diagnosis")
    assert m["8000/0"] == "8000/0 : Neoplasm, benign"
    assert all(k == k.casefold() for k in m)


def test_type_groups_numeric_order_star_only_fallback():
    def tgi(x):
        return FieldMapping("diagnosis", "diagnosis", "c", type_group_index=x)

    # numeric order, not lexicographic ('10' after '2')
    assert type_groups([tgi("10"), tgi("2"), tgi("*"), tgi("0")]) == ["0", "2", "10"]
    assert type_groups([tgi("*")]) == ["*"]
