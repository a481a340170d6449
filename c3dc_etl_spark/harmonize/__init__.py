"""Per-node harmonization pipeline."""

from c3dc_etl_spark.harmonize.builder import build_node, sub_record_explode
from c3dc_etl_spark.harmonize.windows import latest_survival, primary_follow_up

__all__ = ["build_node", "sub_record_explode", "latest_survival", "primary_follow_up"]
