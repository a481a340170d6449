"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from c3dc_etl_spark.session import get_spark

    s = get_spark("pytest")
    yield s


SF0001 = "/root/testdata/sf0.001"
