"""YAML <-> JSON schema conversion (reference
schema/yaml_json_converter.py parity): extension routing, same-format
refusal, and a lossless round trip through both serializations."""

from __future__ import annotations

import json

import pytest

from c3dc_etl_spark.tools import schema_convert as sc

_DOC = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "properties": {
        "participant": {
            "type": "object",
            "required": ["participant_id"],
            "properties": {
                "participant_id": {"type": "string"},
                "race": {"enum": ["White", "Asian", "Not Reported"]},
                "age_at_enrollment": {"type": "integer", "minimum": 0},
            },
        }
    },
    "non_ascii": "héllo — ünïcode",
}


def test_detect_format_and_unsupported():
    assert sc.detect_format("a/b/schema.YAML") == "yaml"
    assert sc.detect_format("x.yml") == "yaml"
    assert sc.detect_format("x.JSON") == "json"
    with pytest.raises(ValueError):
        sc.detect_format("schema.xlsx")


def test_same_format_conversion_refused(tmp_path):
    p = tmp_path / "a.json"
    p.write_text("{}")
    with pytest.raises(ValueError, match="same format"):
        sc.convert(str(p), str(tmp_path / "b.json"))
    with pytest.raises(ValueError, match="same format"):
        sc.convert(str(tmp_path / "a.yaml"), str(tmp_path / "b.yml"))


def test_round_trip_is_lossless(tmp_path):
    src = tmp_path / "schema.json"
    src.write_text(json.dumps(_DOC), encoding="utf-8")
    via_yaml = tmp_path / "schema.yaml"
    back = tmp_path / "back.json"
    sc.convert(str(src), str(via_yaml))
    sc.convert(str(via_yaml), str(back))
    assert json.loads(back.read_text(encoding="utf-8")) == _DOC
    # json output keeps non-ascii literal (ensure_ascii=False)
    assert "héllo" in back.read_text(encoding="utf-8")
