"""Structured Streaming extension (SURVEY.md §2.11).

The reference is pure batch (no watermarks, windows, or state anywhere
— etl/ccdi/c3dc_etl.py:1521-1538 is a CLI batch run), so nothing here
is required for parity. This package is the engine's additive scale
path: file-arrival-triggered harmonization and stateful streaming
dedup, built on the same compiled mapping plans as the batch layer.
"""

from c3dc_etl_spark.streaming.arrivals import (
    harmonized_node_stream,
    start_file_triggered_run,
    streaming_exact_dedup,
    windowed_event_counts,
)
from c3dc_etl_spark.streaming.stateful import running_key_stats

__all__ = [
    "harmonized_node_stream",
    "start_file_triggered_run",
    "streaming_exact_dedup",
    "windowed_event_counts",
    "running_key_stats",
]
