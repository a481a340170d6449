"""Harmonization-ENGINE suite queries.

Unlike the harmonization_ops suite (which demonstrates the operator
*shapes* with inline expressions), every query here drives the actual
engine stack — ``load_mappings`` -> ``CompilerContext`` ->
``compile_node_groups`` / ``build_node`` / ``sub_record_explode`` — on a
mapping "program" defined as data, exactly the way a study configuration
drives the reference ETL (etl/ccdi/c3dc_etl.py:1294-1504).

Each query derives deterministic source columns from a testdata table
(the fixture layer), then hands the DataFrame + mapping JSON to the
engine. The DuckDB oracle re-states BOTH the derivation and the mapping
semantics in SQL, generated from the same model constants
(permissible-value lists, macro formulas, uuid recipe), so a value-hash
match proves the compiler's output — predicate matching (V1-V4),
first-match-wins + lookup fall-through (V7/V13), macros ({uuid} {race}
{sum} {sum_abs_first} {laterality} {diagnosis} {diagnosis_category}),
type conversion (V17-V21), required-property filtering (P6), type-group
fan-out (M1), and sub-record explode (M2) — not a re-implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.functions.columns import (
    ETHNICITY_ALLOWED_VALUES,
    RACE_UNDETERMINED_VALUES,
)
from c3dc_etl_spark.harmonize.builder import build_node
from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import load_mappings
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.suite.registry import load, query

REG = SchemaRegistry()
UUID_SEED = "s42"


# --------------------------------------------------------------------------
# Oracle SQL generators (shared fragments)
# --------------------------------------------------------------------------

def _pv_case(expr: str, pvs: tuple[str, ...]) -> str:
    """lower(trim(expr)) -> PV restoration as a CASE chain (V18 mirror).
    Assumes PVs contain no single quotes (true of the model)."""
    whens = " ".join(f"WHEN '{pv.casefold()}' THEN '{pv}'" for pv in pvs)
    return f"(CASE LOWER(TRIM({expr})) {whens} END)"


def _pv_case_elem(expr: str, pvs: tuple[str, ...]) -> str:
    """PV restoration for an already-trimmed list element."""
    whens = " ".join(f"WHEN '{pv.casefold()}' THEN '{pv}'" for pv in pvs)
    return f"(CASE LOWER({expr}) {whens} END)"


def _split_clean(expr: str) -> str:
    """split_multi mirror: ';'-split, trim, drop blanks, distinct."""
    return (
        f"LIST_DISTINCT(LIST_FILTER("
        f"LIST_TRANSFORM(STRING_SPLIT({expr}, ';'), e -> TRIM(e)), e -> e <> ''))"
    )


def _uuid_sql(*identity: str, node: str, tgi: str) -> str:
    """deterministic_uuid mirror: md5 over 0x1f-joined (seed, node,
    group, identity), formatted v4-shaped (functions/columns.py)."""
    parts = ", ".join(
        [f"'{UUID_SEED}'", f"'{node}'", f"'{tgi}'"]
        + [f"CAST({c} AS VARCHAR)" for c in identity]
    )
    h = f"MD5(CONCAT_WS(CHR(31), {parts}))"
    return (
        f"(SUBSTR({h},1,8) || '-' || SUBSTR({h},9,4) || '-4' || SUBSTR({h},14,3)"
        f" || '-8' || SUBSTR({h},18,3) || '-' || SUBSTR({h},21,12))"
    )


_RACE_PVS = REG.enum_values("participant", "race")
_SEX_PVS = REG.enum_values("participant", "sex_at_birth")
_DIAG_PVS = REG.enum_values("diagnosis", "diagnosis")
_LAT_PVS = REG.enum_values("diagnosis", "laterality")


def _race_sql(race_expr: str, eth_expr: str) -> str:
    """{race} macro mirror (race_merge, functions/columns.py): split both
    cells, PV-restore each element, keep allowed ethnicities, drop
    undetermined races when an ethnicity is present, sorted distinct."""
    cased_r = (
        f"LIST_FILTER(LIST_TRANSFORM({_split_clean(race_expr)},"
        f" e -> {_pv_case_elem('e', _RACE_PVS)}), v -> v IS NOT NULL)"
    )
    cased_e = (
        f"LIST_FILTER(LIST_TRANSFORM({_split_clean(eth_expr)},"
        f" e -> {_pv_case_elem('e', _RACE_PVS)}), v -> v IS NOT NULL)"
    )
    eth_allowed = ", ".join(f"'{v}'" for v in ETHNICITY_ALLOWED_VALUES)
    undet = ", ".join(f"'{v}'" for v in RACE_UNDETERMINED_VALUES)
    eths = f"LIST_FILTER({cased_e}, v -> v IN ({eth_allowed}))"
    kept = (
        f"(CASE WHEN LEN({eths}) > 0"
        f" THEN LIST_FILTER({cased_r}, v -> v NOT IN ({undet}))"
        f" ELSE {cased_r} END)"
    )
    return f"LIST_SORT(LIST_DISTINCT(LIST_CONCAT({kept}, {eths})))"


# --------------------------------------------------------------------------
# Q1: participant node — replace chains (V1/V3/V7) + {race} (V12) + P6
# --------------------------------------------------------------------------

_SRC_RACE_SQL = (
    "CASE c_custkey % 6 WHEN 0 THEN 'white' WHEN 1 THEN 'WHITE;asian'"
    " WHEN 2 THEN 'not reported;hispanic or latino' WHEN 3 THEN 'unknown'"
    " WHEN 4 THEN '' ELSE 'black or african american ; white' END"
)
_SRC_ETH_SQL = (
    "CASE c_custkey % 3 WHEN 0 THEN 'hispanic or latino'"
    " WHEN 1 THEN 'Not Reported' ELSE '' END"
)

PARTICIPANT_MAPPINGS = [
    {"output_field": "participant.participant_id", "source_field": "customer.c_custkey"},
    {
        "output_field": "participant.sex_at_birth",
        "source_field": "customer.src_sex",
        "replacement_values": [
            {"old_value": "building", "new_value": "Female"},
            {"old_value": "AUTOMOBILE ", "new_value": "Male"},
            {"old_value": "machinery", "new_value": "Intersex"},
            {"old_value": "+", "new_value": "Unknown"},
        ],
    },
    {
        "output_field": "participant.race",
        "source_field": "[src_race, src_eth]",
        "replacement_values": [{"old_value": "*", "new_value": "{race}"}],
    },
]

_PARTICIPANT_ORACLE = f"""
WITH src AS (
    SELECT c_custkey,
           c_mktsegment AS src_sex,
           {_SRC_RACE_SQL} AS src_race,
           {_SRC_ETH_SQL} AS src_eth
    FROM customer
)
SELECT CAST(c_custkey AS VARCHAR) AS participant_id,
       COALESCE(
         CASE WHEN LOWER(TRIM(src_sex)) = 'building' THEN 'Female' END,
         CASE WHEN LOWER(TRIM(src_sex)) = 'automobile' THEN 'Male' END,
         CASE WHEN LOWER(TRIM(src_sex)) = 'machinery' THEN 'Intersex' END,
         CASE WHEN TRIM(src_sex) <> '' THEN 'Unknown' END
       ) AS sex_at_birth,
       ARRAY_TO_STRING({_race_sql("src_race", "src_eth")}, ';') AS race
FROM src
WHERE TRIM(CAST(c_custkey AS VARCHAR)) <> ''
"""


@query("engine_participant_node", oracle=_PARTICIPANT_ORACLE, tags=("engine", "harmonize"))
def engine_participant_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCDI-style participant build THROUGH the engine: mapping JSON ->
    load_mappings -> compile_node_groups (inside build_node) -> P6 filter.
    Exercises trimmed case-insensitive replacement matching (V1), the '+'
    wildcard (V3), first-match-wins chain order (V7), the {race} macro
    over a compound source (V12), and mapping-driven projection with
    sheet-prefixed source fields (P4/S4)."""
    cust = load(spark, sf_dir, "customer")
    src = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("src_sex"),
        F.expr(_SRC_RACE_SQL).alias("src_race"),
        F.expr(_SRC_ETH_SQL).alias("src_eth"),
    )
    ctx = CompilerContext(registry=REG, uuid_seed=UUID_SEED, row_identity=("c_custkey",))
    node = build_node(
        src,
        "participant",
        load_mappings(PARTICIPANT_MAPPINGS),
        ctx,
        explode_subrecords=False,
    )
    # Query-layer serialization only: the driver's pandas canonicalizer
    # cannot sort array cells, so join the (already sorted-distinct)
    # race array to a ';' string. Empty arrays map to NULL to match
    # DuckDB's ARRAY_TO_STRING([], ';') = NULL. Engine array semantics
    # are unchanged and unit-tested in tests/test_engine.py.
    return node.withColumn(
        "race",
        F.when(F.size("race") > 0, F.array_join(F.col("race"), ";")),
    )


# --------------------------------------------------------------------------
# Q2: diagnosis node — type-group fan-out (M1) + {uuid} (V8) +
#     {find_enum_value} fall-through (V7/V13) + int conversion (V17/V20)
# --------------------------------------------------------------------------

_SRC_CODE_SQL = (
    "CASE o_orderkey % 4 WHEN 0 THEN '8000/0' WHEN 1 THEN '9500/3'"
    " WHEN 2 THEN 'C71.9' ELSE 'bogus' END"
)
_SRC_AGE_DX_SQL = "CAST(o_orderkey % 20000 AS STRING)"
_SRC_AGE_REL_SQL = "CAST((o_orderkey % 20000) + 500 AS STRING)"

DIAGNOSIS_TG_MAPPINGS = [
    {
        "output_field": "diagnosis.diagnosis",
        "source_field": "src_code",
        "type_group_index": "*",
        "replacement_values": [
            {"old_value": "+", "new_value": "{find_enum_value}"},
            {"old_value": "bogus", "new_value": "9861/3 : Acute myeloid leukemia, NOS"},
        ],
    },
    {"output_field": "diagnosis.diagnosis_id", "source_field": "[uuid]", "type_group_index": "0",
     "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
    {"output_field": "diagnosis.diagnosis_id", "source_field": "[uuid]", "type_group_index": "1",
     "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
    {"output_field": "diagnosis.age_at_diagnosis", "source_field": "src_age_dx",
     "type_group_index": "0"},
    {"output_field": "diagnosis.age_at_diagnosis", "source_field": "src_age_rel",
     "type_group_index": "1"},
    {"output_field": "diagnosis.tumor_classification", "source_field": "[Primary]",
     "type_group_index": "0"},
    {"output_field": "diagnosis.tumor_classification", "source_field": "[Metastatic]",
     "type_group_index": "1"},
]

_ENUM_CODE_WHENS = " ".join(
    f"WHEN '{pv.split(' : ', 1)[0].strip().casefold()}' THEN '{pv}'"
    for pv in _DIAG_PVS
    if " : " in pv
)
_FIND_ENUM_SQL = "(CASE LOWER(TRIM(src_code)) " + _ENUM_CODE_WHENS + " END)"

_DIAG_CHAIN_SQL = f"""COALESCE(
  CASE WHEN TRIM(src_code) <> '' THEN {_FIND_ENUM_SQL} END,
  CASE WHEN LOWER(TRIM(src_code)) = 'bogus'
       THEN '9861/3 : Acute myeloid leukemia, NOS' END
)"""


def _diag_group_sql(tgi: str, age_expr: str, tumor: str) -> str:
    return f"""
SELECT {_uuid_sql("o_orderkey", node="diagnosis", tgi=tgi)} AS diagnosis_id,
       {_DIAG_CHAIN_SQL} AS diagnosis,
       CAST(FLOOR(TRY_CAST({age_expr} AS DOUBLE) + 0.5) AS BIGINT) AS age_at_diagnosis,
       '{tumor}' AS tumor_classification
FROM src
"""


_DIAGNOSIS_TG_ORACLE = f"""
WITH src AS (
    SELECT o_orderkey,
           {_SRC_CODE_SQL} AS src_code,
           {_SRC_AGE_DX_SQL} AS src_age_dx,
           {_SRC_AGE_REL_SQL} AS src_age_rel
    FROM orders
),
unioned AS (
    {_diag_group_sql("0", "src_age_dx", "Primary")}
    UNION ALL
    {_diag_group_sql("1", "src_age_rel", "Metastatic")}
)
SELECT * FROM unioned WHERE diagnosis IS NOT NULL AND TRIM(diagnosis) <> ''
"""


@query("engine_typegroup_fanout", oracle=_DIAGNOSIS_TG_ORACLE, tags=("engine", "harmonize"))
def engine_typegroup_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-group fan-out THROUGH the engine (M1): two numbered groups
    compile to two projections unioned by name; per-group {uuid} ids
    (V8, content-derived, deterministic at any parallelism); the
    {find_enum_value} arm falls through on lookup miss to the next
    replacement arm (V7+V13, compiled as coalesce-of-whens); string ->
    integer age conversion with half-up rounding (V17/V20); records with
    a failed required 'diagnosis' dropped by P6."""
    orders = load(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey",
        F.expr(_SRC_CODE_SQL).alias("src_code"),
        F.expr(_SRC_AGE_DX_SQL).alias("src_age_dx"),
        F.expr(_SRC_AGE_REL_SQL).alias("src_age_rel"),
    )
    ctx = CompilerContext(registry=REG, uuid_seed=UUID_SEED, row_identity=("o_orderkey",))
    return build_node(
        src,
        "diagnosis",
        load_mappings(DIAGNOSIS_TG_MAPPINGS),
        ctx,
        explode_subrecords=False,
    )


# --------------------------------------------------------------------------
# Q3: laboratory_test node — {sum} (V10) + {sum_abs_first} (V11) +
#     numeric guard via default (V21) + number/integer conversion
# --------------------------------------------------------------------------

_SRC_A_SQL = (
    "CASE l_linenumber % 4 WHEN 0 THEN '' WHEN 1 THEN '12.5'"
    " WHEN 2 THEN 'abc' ELSE '-7' END"
)
_SRC_B_SQL = "CASE l_partkey % 3 WHEN 0 THEN '3' WHEN 1 THEN '' ELSE '4.25' END"

LAB_MAPPINGS = [
    {"output_field": "laboratory_test.laboratory_test_id", "source_field": "[uuid]",
     "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
    {
        "output_field": "laboratory_test.test_result_numeric",
        "source_field": "[src_a, src_b]",
        "default_value": -999,
        "replacement_values": [{"old_value": "*", "new_value": "{sum}"}],
    },
    {
        "output_field": "laboratory_test.age_at_laboratory_test",
        "source_field": "[src_a, src_b]",
        "replacement_values": [{"old_value": "*", "new_value": "{sum_abs_first}"}],
    },
]

_SUM_SQL = """CASE
  WHEN TRIM(src_a) = '' OR TRIM(src_b) = '' THEN NULL
  WHEN TRY_CAST(src_a AS DOUBLE) + TRY_CAST(src_b AS DOUBLE) IS NULL THEN -999.0
  ELSE TRY_CAST(src_a AS DOUBLE) + TRY_CAST(src_b AS DOUBLE)
END"""

_SUM_ABS_FIRST_SQL = """CASE
  WHEN TRIM(src_a) = '' OR TRIM(src_b) = '' THEN NULL
  ELSE ABS(TRY_CAST(src_a AS DOUBLE)) + TRY_CAST(src_b AS DOUBLE)
END"""

_LAB_ORACLE = f"""
WITH src AS (
    SELECT l_orderkey, l_linenumber,
           {_SRC_A_SQL} AS src_a,
           {_SRC_B_SQL} AS src_b
    FROM lineitem
)
SELECT {_uuid_sql("l_orderkey", "l_linenumber", node="laboratory_test", tgi="*")}
           AS laboratory_test_id,
       {_SUM_SQL} AS test_result_numeric,
       CAST(FLOOR(({_SUM_ABS_FIRST_SQL}) + 0.5) AS BIGINT) AS age_at_laboratory_test
FROM src
"""


@query("engine_sum_macros", oracle=_LAB_ORACLE, tags=("engine", "harmonize"))
def engine_sum_macros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal-sum macros THROUGH the engine: {sum} — null when ANY
    addend is blank, mapping default when an addend is non-numeric (V10 +
    V21); {sum_abs_first} — abs of the first addend, ages relative to
    diagnosis (V11); double output kept exact (V17 'number'), integer
    output half-up rounded (V20); composite row identity feeds {uuid}."""
    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_SRC_A_SQL).alias("src_a"),
        F.expr(_SRC_B_SQL).alias("src_b"),
    )
    ctx = CompilerContext(
        registry=REG, uuid_seed=UUID_SEED, row_identity=("l_orderkey", "l_linenumber")
    )
    return build_node(
        src, "laboratory_test", load_mappings(LAB_MAPPINGS), ctx, explode_subrecords=False
    )


# --------------------------------------------------------------------------
# Q4: diagnosis node — {diagnosis} via ICD-O lookup (V14),
#     {diagnosis_category} (V15), {laterality} (V16)
# --------------------------------------------------------------------------

_SRC_ICDO_SQL = (
    "CASE p_partkey % 3 WHEN 0 THEN '8000/3' WHEN 1 THEN 'C99X' ELSE 'zzz' END"
)
_SRC_LAT1_SQL = (
    "CASE p_partkey % 4 WHEN 0 THEN 'left' WHEN 2 THEN 'RIGHT ' ELSE '' END"
)
_SRC_LAT2_SQL = "CASE p_partkey % 4 WHEN 1 THEN 'bilateral' ELSE '' END"
_SRC_DXNAME_SQL = (
    "CASE p_partkey % 3 WHEN 0 THEN 'neuroblastoma, nos'"
    " WHEN 1 THEN 'ACUTE MYELOID LEUKEMIA, NOS' ELSE 'unknown thing' END"
)

ICDO_LOOKUP = {"C99X": "Neuroblastoma, NOS"}
DX_CATEGORY_LOOKUP = {
    "Neuroblastoma, NOS": "Embryonal tumor",
    "Acute myeloid leukemia, NOS": "Leukemia",
}

LOOKUP_MAPPINGS = [
    {"output_field": "diagnosis.diagnosis_id", "source_field": "[uuid]",
     "replacement_values": [{"old_value": "*", "new_value": "{uuid}"}]},
    {"output_field": "diagnosis.diagnosis", "source_field": "src_icdo",
     "replacement_values": [{"old_value": "+", "new_value": "{diagnosis}"}]},
    {"output_field": "diagnosis.laterality", "source_field": "[src_lat1, src_lat2]",
     "replacement_values": [{"old_value": "*", "new_value": "{laterality}"}]},
    {"output_field": "diagnosis.diagnosis_comment", "source_field": "src_dxname",
     "replacement_values": [{"old_value": "+", "new_value": "{diagnosis_category}"}]},
    {"output_field": "diagnosis.tumor_classification", "source_field": "[Primary]"},
]

# {diagnosis}: direct 'CODE : TERM' PVs plus ICD-O code -> term -> PV
_DIAG_LOOKUP_WHENS = _ENUM_CODE_WHENS + " ".join(
    f" WHEN '{code.casefold()}' THEN '{pv}'"
    for code, term in ICDO_LOOKUP.items()
    for pv in _DIAG_PVS
    if " : " in pv and pv.split(" : ", 1)[1].strip().casefold() == term.strip().casefold()
)
_DIAG_MACRO_SQL = "(CASE LOWER(TRIM(src_icdo)) " + _DIAG_LOOKUP_WHENS + " END)"

_DXCAT_WHENS = " ".join(
    f"WHEN '{k.casefold()}' THEN '{v}'" for k, v in sorted(DX_CATEGORY_LOOKUP.items())
)
_DXCAT_SQL = "(CASE LOWER(TRIM(src_dxname)) " + _DXCAT_WHENS + " END)"

_LOOKUP_ORACLE = f"""
WITH src AS (
    SELECT p_partkey,
           {_SRC_ICDO_SQL} AS src_icdo,
           {_SRC_LAT1_SQL} AS src_lat1,
           {_SRC_LAT2_SQL} AS src_lat2,
           {_SRC_DXNAME_SQL} AS src_dxname
    FROM part
),
built AS (
    SELECT {_uuid_sql("p_partkey", node="diagnosis", tgi="*")} AS diagnosis_id,
           CASE WHEN TRIM(src_icdo) <> '' THEN {_DIAG_MACRO_SQL} END AS diagnosis,
           COALESCE({_pv_case("src_lat1", _LAT_PVS)},
                    {_pv_case("src_lat2", _LAT_PVS)}) AS laterality,
           CASE WHEN TRIM(src_dxname) <> '' THEN {_DXCAT_SQL} END AS diagnosis_comment,
           'Primary' AS tumor_classification
    FROM src
)
SELECT * FROM built WHERE diagnosis IS NOT NULL AND TRIM(diagnosis) <> ''
"""


@query("engine_lookup_macros", oracle=_LOOKUP_ORACLE, tags=("engine", "harmonize"))
def engine_lookup_macros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCI lookup macros THROUGH the engine: {diagnosis} resolves a
    direct 'CODE : TERM' PV or an ICD-O code via the ctx.lookups['icdo']
    table -> term -> PV (V14); {diagnosis_category} maps via
    ctx.lookups['diagnosis_category'] (V15); {laterality} takes the first
    PV-matching of N source columns (V16). Lookup misses yield null and
    the required-diagnosis filter drops those records (P6)."""
    part = load(spark, sf_dir, "part")
    src = part.select(
        "p_partkey",
        F.expr(_SRC_ICDO_SQL).alias("src_icdo"),
        F.expr(_SRC_LAT1_SQL).alias("src_lat1"),
        F.expr(_SRC_LAT2_SQL).alias("src_lat2"),
        F.expr(_SRC_DXNAME_SQL).alias("src_dxname"),
    )
    ctx = CompilerContext(
        registry=REG,
        uuid_seed=UUID_SEED,
        row_identity=("p_partkey",),
        lookups={"icdo": ICDO_LOOKUP, "diagnosis_category": DX_CATEGORY_LOOKUP},
    )
    return build_node(
        src, "diagnosis", load_mappings(LOOKUP_MAPPINGS), ctx, explode_subrecords=False
    )


# --------------------------------------------------------------------------
# Q5: sub-record explode (M2) + enum case normalization (V18) through the
#     engine's build pipeline
# --------------------------------------------------------------------------

_SRC_DIAG_SQL = (
    "CASE s_suppkey % 3"
    " WHEN 0 THEN '9500/3 : Neuroblastoma, NOS;8000/0 : Neoplasm, benign'"
    " WHEN 1 THEN '9861/3 : acute myeloid leukemia, nos'"
    " ELSE '8000/0 : Neoplasm, benign;8000/0 : Neoplasm, benign' END"
)

SUBREC_MAPPINGS = [
    {"output_field": "diagnosis.diagnosis_id", "source_field": "src_id"},
    {"output_field": "diagnosis.diagnosis", "source_field": "src_diag"},
    {"output_field": "diagnosis.tumor_classification", "source_field": "[Primary]"},
]

_SUBREC_ORACLE = f"""
WITH src AS (
    SELECT CAST(s_suppkey AS VARCHAR) AS src_id,
           {_SRC_DIAG_SQL} AS src_diag
    FROM supplier
),
parted AS (
    SELECT src_id, src_diag,
           CONTAINS(src_diag, ';') AS has_delim,
           CASE WHEN CONTAINS(src_diag, ';')
                THEN LIST_SORT({_split_clean("src_diag")})
                ELSE [src_diag] END AS parts
    FROM src
),
ex AS (
    SELECT src_id, has_delim, parts,
           UNNEST(RANGE(1, LEN(parts) + 1)) AS i
    FROM parted
)
SELECT CASE WHEN has_delim THEN src_id || '_' || CAST(i AS VARCHAR)
            ELSE src_id END AS diagnosis_id,
       {_pv_case("parts[i]", _DIAG_PVS)} AS diagnosis,
       'Primary' AS tumor_classification
FROM ex
"""


@query("engine_subrecord_explode", oracle=_SUBREC_ORACLE, tags=("engine", "harmonize"))
def engine_subrecord_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-record explode THROUGH the engine (M2): a ';' in a scalar
    enum source cell clones the record per distinct sorted value with
    `_1.._n` id suffixes — including the 'A;A' edge where the distinct
    set collapses to ONE suffixed record (reference
    etl/ccdi/c3dc_etl.py:1240-1292); each exploded value is then enum
    case-normalized (V18: 'acute myeloid leukemia, nos' -> PV casing)."""
    supp = load(spark, sf_dir, "supplier")
    src = supp.select(
        F.col("s_suppkey").cast("string").alias("src_id"),
        F.expr(_SRC_DIAG_SQL).alias("src_diag"),
    )
    ctx = CompilerContext(registry=REG, uuid_seed=UUID_SEED, row_identity=("src_id",))
    return build_node(
        src,
        "diagnosis",
        load_mappings(SUBREC_MAPPINGS),
        ctx,
        explode_subrecords=True,
        id_source_col="src_id",
    )


# --------------------------------------------------------------------------
# Q6/Q7: order-sensitive record selection THROUGH harmonize.windows (A1/A2)
# --------------------------------------------------------------------------

_MIN_AGE_SENTINEL = -(1 << 62)

_LATEST_SURVIVAL_ORACLE = f"""
WITH flags AS (
    SELECT user_id, event_id, event_type, EPOCH_US(ts) AS age,
           (event_type = 'error') AS is_dead
    FROM events
),
bad AS (
    SELECT DISTINCT user_id FROM (
        SELECT user_id, is_dead, age,
               MAX(CASE WHEN is_dead THEN age END)
                   OVER (PARTITION BY user_id) AS mda
        FROM flags
    )
    WHERE NOT is_dead AND mda IS NOT NULL AND age > mda
),
picked AS (
    SELECT user_id, event_id, event_type, age,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY CASE WHEN is_dead THEN 0 ELSE 1 END ASC,
                        CASE WHEN is_dead THEN event_id ELSE 0 END ASC,
                        CASE WHEN is_dead THEN 0
                             ELSE COALESCE(age, {_MIN_AGE_SENTINEL}) END DESC,
                        CASE WHEN is_dead THEN 0 ELSE event_id END DESC
           ) AS rn
    FROM flags
)
SELECT user_id, event_id, event_type, age
FROM picked
WHERE rn = 1 AND user_id NOT IN (SELECT user_id FROM bad)
"""


@query("engine_latest_survival", oracle=_LATEST_SURVIVAL_ORACLE, tags=("engine", "window"))
def engine_latest_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 THROUGH harmonize.windows.latest_survival: per participant the
    first 'Dead' record in source order wins, else the max-age 'Alive'
    (later record breaking ties); participants whose Alive age exceeds
    their max Dead age are inconsistent and dropped entirely (reference
    warns+drops, etl/ccdi/c3dc_etl.py:1199-1207). Mapped onto events:
    'error' = Dead, ts = age, event_id = source order."""
    events = load(spark, sf_dir, "events")
    df = events.select("user_id", "event_id", "event_type", F.col("ts_us").alias("age"))
    from c3dc_etl_spark.harmonize.windows import latest_survival

    return latest_survival(
        df,
        participant_col="user_id",
        status_col="event_type",
        age_col="age",
        order_col="event_id",
        dead_value="error",
        drop_inconsistent=True,
    )


_FOLLOW_UP_ORACLE = """
WITH flags AS (
    SELECT user_id, event_id, event_type,
           COALESCE(CAST(EPOCH_US(ts) AS STRING), '') AS dt
    FROM events
)
SELECT user_id, event_id, event_type
FROM (
    SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id
                ORDER BY CASE event_type WHEN 'error' THEN 0
                              WHEN 'purchase' THEN 1 ELSE 2 END ASC,
                         CASE WHEN event_type = 'error' THEN dt ELSE '' END ASC,
                         CASE WHEN event_type = 'error' THEN '' ELSE dt END DESC,
                         event_id DESC
              ) AS rn
    FROM flags
)
WHERE rn = 1
"""


@query("engine_primary_follow_up", oracle=_FOLLOW_UP_ORACLE, tags=("engine", "window"))
def engine_primary_follow_up(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 THROUGH harmonize.windows.primary_follow_up: earliest 'Dead'
    (min date), else latest 'Alive', else latest-any, with the later
    source record breaking remaining ties (reference
    etl/mci/c3dc_etl.py:811-870). 'error' = Dead, 'purchase' = Alive."""
    events = load(spark, sf_dir, "events")
    df = events.select(
        "user_id", "event_id", "event_type", F.col("ts_us").cast("string").alias("dt")
    )
    from c3dc_etl_spark.harmonize.windows import primary_follow_up

    return primary_follow_up(
        df,
        participant_col="user_id",
        status_col="event_type",
        date_col="dt",
        order_col="event_id",
        dead_value="error",
        alive_value="purchase",
    ).select("user_id", "event_id", "event_type")

# --------------------------------------------------------------------------
# Q7: study node — {field:NAME} template splice (V9) through the engine
# --------------------------------------------------------------------------

_SRC_ACC_SQL = "'phs' || LPAD(CAST(n_nationkey AS STRING), 6, '0')"
_SRC_VER_SQL = "CAST(n_nationkey % 3 + 1 AS STRING)"

STUDY_SPLICE_MAPPINGS = [
    {
        "output_field": "study.study_id",
        "source_field": "acc",
        "replacement_values": [
            {"old_value": "*", "new_value": "{field:acc}.v{field:ver}"}
        ],
    },
    {"output_field": "study.dbgap_accession", "source_field": "acc"},
    {
        "output_field": "study.study_name",
        "source_field": "n_name",
        "replacement_values": [
            {"old_value": "*", "new_value": "Study {field:n_name} ({field:acc}.v{field:ver})"}
        ],
    },
]

_STUDY_SPLICE_ORACLE = """
WITH src AS (
    SELECT n_name,
           'phs' || LPAD(CAST(n_nationkey AS VARCHAR), 6, '0') AS acc,
           CAST(n_nationkey % 3 + 1 AS VARCHAR) AS ver
    FROM nation
)
SELECT acc || '.v' || ver AS study_id,
       acc AS dbgap_accession,
       'Study ' || n_name || ' (' || acc || '.v' || ver || ')' AS study_name
FROM src
WHERE TRIM(acc || '.v' || ver) <> '' AND TRIM(acc) <> ''
"""


@query("engine_field_splice", oracle=_STUDY_SPLICE_ORACLE, tags=("engine", "harmonize"))
def engine_field_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{field:NAME} template splicing (V9) THROUGH the engine: a
    replacement whose new_value interleaves literal text with values of
    OTHER source columns, compiled to a concat of literals and coalesced
    casts (mapping/compiler.py). The reference substitutes these
    templates while applying replacement values
    (etl/ccdi/c3dc_etl.py:897-904) — the study_id 'phsXXXXXX.vN' accession
    pattern is its canonical use. Required-property filter (P6) applies
    to study_id and dbgap_accession."""
    nation = load(spark, sf_dir, "nation")
    src = nation.select(
        "n_name",
        F.expr(_SRC_ACC_SQL).alias("acc"),
        F.expr(_SRC_VER_SQL).alias("ver"),
    )
    ctx = CompilerContext(registry=REG, uuid_seed=UUID_SEED, row_identity=("acc",))
    return build_node(
        src,
        "study",
        load_mappings(STUDY_SPLICE_MAPPINGS),
        ctx,
        explode_subrecords=False,
    )
