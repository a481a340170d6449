"""C3DC data-model schema layer: node registry, Spark types, JSON Schema."""

from c3dc_etl_spark.schema.model import MODEL, NodeDef, PropDef, RelationshipDef
from c3dc_etl_spark.schema.registry import SchemaRegistry

__all__ = ["MODEL", "NodeDef", "PropDef", "RelationshipDef", "SchemaRegistry"]
