"""XLSX workbook scan (S1) + per-node tab routing (S4).

Reference: _get_petl_table_from_source_file (etl/ccdi/c3dc_etl.py:374-413,
petl.fromxlsx read_only with data_only formula evaluation) and
_load_source_data's node->worksheet routing derived from mapping
source-field prefixes with a one-tab-per-node invariant (:466-522).

The byte-level XLSX parse is driver-side (workbooks are per-study,
megabytes not terabytes), always via the vendored pure-stdlib codec
(sources/xlsx_lite.py) so the untyped-string contract is identical in
every environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from c3dc_etl_spark.mapping.model import FieldMapping
from c3dc_etl_spark.sources import xlsx_lite

EXCEL_SHEET_NAME_LIMIT = 31  # xlsx hard limit (etl/mci/data_pivoter.py:150-156)


def truncate_sheet_name(name: str) -> str:
    return name[:EXCEL_SHEET_NAME_LIMIT]


def route_tabs(mappings: list[FieldMapping]) -> dict[str, str]:
    """S4: output node -> source worksheet, derived from the mapping
    source-field prefixes ('sheet.column'). A node whose mappings name
    two different sheets is a config error (reference raises,
    etl/ccdi/c3dc_etl.py:493-503); prefix-less mappings are sheet-
    agnostic and route with their node's prefixed siblings."""
    routes: dict[str, str] = {}
    for m in mappings:
        sheet = m.source_sheet()
        if sheet is None:
            continue
        prev = routes.get(m.output_node)
        if prev is not None and prev != sheet:
            raise ValueError(
                f"node {m.output_node!r} maps to two worksheets: {prev!r} and {sheet!r}"
            )
        routes[m.output_node] = sheet
    return routes


def read_worksheet(
    spark: SparkSession,
    path: str,
    sheet: str,
    *,
    prune_headerless: bool = True,
) -> DataFrame:
    """S1: one worksheet -> untyped string DataFrame, snapshot into
    Spark immediately — everything downstream is a normal DataFrame.

    Always parsed by the vendored codec (sources/xlsx_lite.py), never
    pandas.read_excel, so the cell-to-string contract (booleans ->
    'TRUE'/'FALSE', empty string preserved, numerics as raw text) is
    identical in every environment — an openpyxl-equipped image must
    not change scan results (pandas would yield 'True'/NaN instead and
    silently flip the golden oracles)."""
    grid = xlsx_lite.read_rows(path, sheet)
    if not grid:
        return spark.createDataFrame([], StructType([]))
    header, data = grid[0], grid[1:]
    cols = [
        (i, str(h) if h is not None and str(h).strip() else f"_c{i}")
        for i, h in enumerate(header)
        if not prune_headerless or (h is not None and str(h).strip())
    ]
    # Duplicate header strings would yield duplicate StructField names —
    # ambiguous by-name selects downstream. De-duplicate pandas-style
    # (second occurrence gets .1, third .2, ...); headerless cells kept
    # by prune_headerless=False get positional _c<i> names above. A
    # generated name is checked against BOTH already-taken names and
    # still-upcoming literal headers, so ['x', 'x', 'x.1'] yields
    # ['x', 'x.2', 'x.1'], never a second collision.
    from collections import Counter

    remaining = Counter(name for _, name in cols)
    taken: set[str] = set()
    counts: dict[str, int] = {}
    deduped: list[tuple[int, str]] = []
    for i, name in cols:
        remaining[name] -= 1
        candidate = name
        if candidate in taken:
            n = counts.get(name, 0) + 1
            candidate = f"{name}.{n}"
            while candidate in taken or remaining.get(candidate, 0) > 0:
                n += 1
                candidate = f"{name}.{n}"
            counts[name] = n
        taken.add(candidate)
        deduped.append((i, candidate))
    cols = deduped
    schema = StructType(
        [StructField(name, StringType(), True) for _, name in cols]
    )
    rows = [tuple(r[i] if i < len(r) else None for i, _ in cols) for r in data]
    return spark.createDataFrame(rows, schema)
