"""The harmonized data model: 12 node types in a hierarchical entity graph.

Re-expresses the reference's model semantics (node set from
etl/ccdi/c3dc_etl_model_node.py:6-21; relationship id-link generation from
schema/schema_creator.py:371-419; pluralization rules
etl/ccdi/c3dc_etl_model_node.py:34-46) with a representative property
subset per node — enough to exercise every operator class (enums, arrays,
integer day-ages with the 54750 cap, required flags, to-one/to-many links)
without reproducing the reference's full 5k-value enum catalogs.

The graph: study -> consent_group -> participant -> {7 observation node
types}, plus study -> reference_file and participant -> synonym.
Parent/child links materialize BOTH directions as `<node>.<node>_id`
properties — scalar for to-one, array for to-many.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_AGE_DAYS = 54750  # 150 years, the reference's age_at_* maximum


@dataclass(frozen=True)
class PropDef:
    name: str
    type: str = "string"  # string | integer | number | array
    enum: tuple[str, ...] = ()
    required: bool = False
    maximum: int | None = None
    minimum: int | None = None


@dataclass(frozen=True)
class RelationshipDef:
    parent: str
    child: str
    # 'many' children per parent; every child has exactly one parent
    child_multiplicity: str = "many"


@dataclass(frozen=True)
class NodeDef:
    name: str
    props: tuple[PropDef, ...]

    @property
    def id_field(self) -> str:
        return f"{self.name}_id"

    @property
    def plural(self) -> str:
        if self.name.endswith("sis"):  # diagnosis -> diagnoses
            return self.name[:-3] + "ses"
        if self.name.endswith("s"):  # treatment_response -> ..._responses
            return self.name + "es"
        if self.name == "study":
            return "studies"
        return self.name + "s"


_SURVIVAL_STATUS = ("Alive", "Dead", "Unknown", "Not Reported")
_SEX = ("Female", "Male", "Intersex", "Unknown", "Not Reported")
_RACE = (
    "American Indian or Alaska Native",
    "Asian",
    "Black or African American",
    "Hispanic or Latino",
    "Native Hawaiian or other Pacific Islander",
    "White",
    "More than one race",
    "Not Allowed to Collect",
    "Not Reported",
    "Unknown",
)
_DIAGNOSIS = (
    "8000/0 : Neoplasm, benign",
    "8000/3 : Neoplasm, malignant",
    "9500/3 : Neuroblastoma, NOS",
    "9861/3 : Acute myeloid leukemia, NOS",
    "9811/3 : B lymphoblastic leukemia/lymphoma, NOS",
)
_ANATOMIC_SITE = ("C71.9 : Brain, NOS", "C74.9 : Adrenal gland, NOS", "C42.1 : Bone marrow")
_LATERALITY = ("Left", "Right", "Bilateral", "Midline", "Unknown", "Not Reported")
_TUMOR_CLASS = ("Primary", "Metastatic", "Regional", "Unknown")
_TREATMENT_TYPE = ("Chemotherapy", "Radiation Therapy", "Stem Cell Transplant", "Surgery", "Immunotherapy")
_RESPONSE = ("Complete Remission", "Partial Remission", "Stable Disease", "Progressive Disease", "Unknown")
_FIRST_EVENT = ("Relapse", "Death", "Second Malignant Neoplasm", "Censored", "None")


def _age(name: str, required: bool = False) -> PropDef:
    return PropDef(name, "integer", required=required, maximum=MAX_AGE_DAYS, minimum=-MAX_AGE_DAYS)


MODEL: dict[str, NodeDef] = {
    n.name: n
    for n in (
        NodeDef(
            "study",
            (
                PropDef("study_id", required=True),
                PropDef("dbgap_accession", required=True),
                PropDef("study_name"),
                PropDef("study_description"),
            ),
        ),
        NodeDef(
            "consent_group",
            (
                PropDef("consent_group_id", required=True),
                PropDef("consent_group_name"),
                PropDef("consent_group_suffix"),
            ),
        ),
        NodeDef(
            "participant",
            (
                PropDef("participant_id", required=True),
                PropDef("race", "array", enum=_RACE),
                PropDef("sex_at_birth", enum=_SEX),
            ),
        ),
        NodeDef(
            "diagnosis",
            (
                PropDef("diagnosis_id", required=True),
                PropDef("diagnosis", enum=_DIAGNOSIS, required=True),
                _age("age_at_diagnosis"),
                PropDef("year_of_diagnosis", "integer"),
                PropDef("anatomic_site", "array", enum=_ANATOMIC_SITE),
                PropDef("laterality", enum=_LATERALITY),
                PropDef("tumor_classification", enum=_TUMOR_CLASS, required=True),
                PropDef("diagnosis_comment"),
            ),
        ),
        NodeDef(
            "survival",
            (
                PropDef("survival_id", required=True),
                PropDef("last_known_survival_status", enum=_SURVIVAL_STATUS, required=True),
                _age("age_at_last_known_survival_status"),
                PropDef("event_free_survival_status", enum=_FIRST_EVENT),
                _age("age_at_event_free_survival_status"),
                PropDef("first_event", enum=_FIRST_EVENT),
                PropDef("cause_of_death"),
            ),
        ),
        NodeDef(
            "treatment",
            (
                PropDef("treatment_id", required=True),
                PropDef("treatment_type", "array", enum=_TREATMENT_TYPE, required=True),
                PropDef("treatment_agent", "array"),
                _age("age_at_treatment_start"),
                _age("age_at_treatment_end"),
            ),
        ),
        NodeDef(
            "treatment_response",
            (
                PropDef("treatment_response_id", required=True),
                PropDef("response", enum=_RESPONSE, required=True),
                _age("age_at_response"),
                PropDef("response_category"),
                PropDef("response_system"),
            ),
        ),
        NodeDef(
            "genetic_analysis",
            (
                PropDef("genetic_analysis_id", required=True),
                PropDef("gene"),
                PropDef("result"),
                _age("age_at_genetic_analysis"),
            ),
        ),
        NodeDef(
            "laboratory_test",
            (
                PropDef("laboratory_test_id", required=True),
                PropDef("test_name"),
                PropDef("test_result_numeric", "number"),
                PropDef("test_units"),
                _age("age_at_laboratory_test"),
            ),
        ),
        NodeDef(
            "synonym",
            (
                PropDef("synonym_id", required=True),
                PropDef("repository_of_synonym_id"),
                PropDef("associated_id"),
                PropDef("domain_category"),
            ),
        ),
        NodeDef(
            "reference_file",
            (
                PropDef("reference_file_id", required=True),
                PropDef("file_name", required=True),
                PropDef("file_type"),
                PropDef("file_size", "integer", minimum=0),
                PropDef("md5sum"),
                PropDef("dcf_indexd_guid"),
                PropDef("file_url"),
            ),
        ),
    )
}

# The 7 observation node types hanging off participant
# (etl/target/c3dc_etl.py:100-108 enumerates the same set).
OBSERVATION_NODES = (
    "diagnosis",
    "survival",
    "treatment",
    "treatment_response",
    "genetic_analysis",
    "laboratory_test",
    "synonym",
)

RELATIONSHIPS: tuple[RelationshipDef, ...] = (
    RelationshipDef("study", "consent_group"),
    RelationshipDef("study", "reference_file"),
    RelationshipDef("consent_group", "participant"),
    *[RelationshipDef("participant", obs) for obs in OBSERVATION_NODES],
)
