

def test_state_partition_sizing_derivation():
    """The drain's state-partition count is DERIVED (state volume /
    per-partition budget, next power of two), not a local-mode magic
    number a cluster port could inherit (VERDICT r9 item 8)."""
    from c3dc_etl_spark.streaming.sizing import (
        DRAIN_STATE_BYTES,
        state_partitions,
    )

    # the measured local tune falls out of the derivation
    assert state_partitions(DRAIN_STATE_BYTES) == 8
    # cluster scale sizes UP with volume, never pinned to cores
    assert state_partitions(100 << 30) == 8192
    # degenerate and clamped cases
    assert state_partitions(0) == 1
    assert state_partitions(1) == 1
    assert state_partitions(100 << 20, max_partitions=4) == 4
    assert state_partitions(1, min_partitions=16) == 16
    import pytest as _pytest

    with _pytest.raises(ValueError):
        state_partitions(-1)
    with _pytest.raises(ValueError):
        state_partitions(10, 0)
