"""Every subpackage must import cleanly.

Regression guard for the round-1 defect where a raw NUL byte in
functions/columns.py made the whole harmonization-engine stack
unimportable while all tests stayed green (nothing imported it).
"""

import importlib
import pathlib
import pkgutil

import c3dc_etl_spark

PKG_ROOT = pathlib.Path(c3dc_etl_spark.__file__).parent


def _walk(pkg):
    yield pkg.__name__
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        yield info.name


def test_every_module_imports():
    names = sorted(set(_walk(c3dc_etl_spark)))
    assert len(names) > 10
    for name in names:
        importlib.import_module(name)


def test_no_nul_bytes_in_sources():
    for path in PKG_ROOT.rglob("*.py"):
        assert b"\x00" not in path.read_bytes(), f"raw NUL byte in {path}"
