"""Tools (R3/R4/X6) and streaming extension tests."""

from __future__ import annotations

import json
import time

import pytest

from c3dc_etl_spark.mapping.compiler import CompilerContext
from c3dc_etl_spark.mapping.model import load_mappings
from c3dc_etl_spark.schema.registry import SchemaRegistry
from c3dc_etl_spark.streaming import (
    harmonized_node_stream,
    start_file_triggered_run,
    streaming_exact_dedup,
)
from c3dc_etl_spark.streaming.arrivals import subject_stream
from c3dc_etl_spark.tools import (
    duplicate_pvs,
    non_ascii_pvs,
    reference_file_entries,
    strip_section_headers,
    unpivot_transformation_mappings,
)

REG = SchemaRegistry()


# -- unpivoter (R3) --------------------------------------------------------

def test_unpivot_groups_and_dedupes_pairs():
    rows = [
        {"Target Variable Name": "participant.sex_at_birth",
         "Source Variable Name": "SEX",
         "Source Permissible Values Term": "f",
         "Target Permissible Values Term": "Female"},
        {"Target Variable Name": "participant.sex_at_birth",
         "Source Variable Name": "SEX",
         "Source Permissible Values Term": "m",
         "Target Permissible Values Term": "Male"},
        # duplicate pair -> dropped (D5)
        {"Target Variable Name": "participant.sex_at_birth",
         "Source Variable Name": "SEX",
         "Source Permissible Values Term": "f",
         "Target Permissible Values Term": "Female"},
        {"Target Variable Name": "diagnosis.age_at_diagnosis",
         "Source Variable Name": "AGE",
         "Default Value If Null/Blank": '"-999"'},
    ]
    maps = unpivot_transformation_mappings(rows)
    assert len(maps) == 2
    sex = maps[0]
    assert sex["source_field"] == "SEX"
    assert sex["replacement_values"] == [
        {"old_value": "f", "new_value": "Female"},
        {"old_value": "m", "new_value": "Male"},
    ]
    age = maps[1]
    assert age["default_value"] == "-999"
    # output feeds straight into the engine's loader
    parsed = load_mappings(maps)
    assert parsed[0].output_node == "participant"


def test_unpivot_conflicting_defaults_raise():
    rows = [
        {"Target Variable Name": "diagnosis.age_at_diagnosis",
         "Source Variable Name": "AGE", "Default Value If Null/Blank": "1"},
        {"Target Variable Name": "diagnosis.age_at_diagnosis",
         "Source Variable Name": "AGE", "Default Value If Null/Blank": "2"},
    ]
    with pytest.raises(ValueError, match="conflicting default"):
        unpivot_transformation_mappings(rows)


def test_reference_file_entries(tmp_path):
    p = tmp_path / "config.json"
    p.write_text('{"a": 1}')
    [entry] = reference_file_entries([str(p)])
    assert entry["file_name"] == "config.json"
    assert entry["file_size"] == 8
    assert len(entry["md5sum"]) == 32


# -- schema checks (X6) ----------------------------------------------------

def test_schema_pv_checks():
    pvs = ["Alpha", "alpha", "Café", "[---- Section ----]", "Beta"]
    assert duplicate_pvs(pvs) == ["Alpha"]
    assert non_ascii_pvs(pvs) == [("Café", ["é"])]
    assert strip_section_headers(pvs) == ["Alpha", "alpha", "Café", "Beta"]


# -- streaming -------------------------------------------------------------

PARTICIPANT_MAPS = load_mappings(
    [
        {"output_field": "participant.participant_id", "source_field": "usi"},
        {"output_field": "participant.sex_at_birth", "source_field": "sex",
         "replacement_values": [
             {"old_value": "f", "new_value": "Female"},
             {"old_value": "+", "new_value": "Unknown"},
         ]},
    ]
)


def test_streaming_harmonization_file_trigger(spark, tmp_path):
    src = tmp_path / "arrivals"
    src.mkdir()
    (src / "batch1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"usi": "P1", "sex": "F"},
                {"usi": "P2", "sex": "x"},
                {"usi": "", "sex": "f"},  # P6-dropped
            ]
        )
    )
    batch_schema = spark.read.json(str(src)).schema
    stream = subject_stream(spark, str(src), batch_schema)
    assert stream.isStreaming
    ctx = CompilerContext(registry=REG, uuid_seed="s", row_identity=("usi",))
    harmonized = harmonized_node_stream(stream, "participant", PARTICIPANT_MAPS, ctx)
    q = start_file_triggered_run(
        harmonized,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(60)
    out = {r["participant_id"]: r for r in spark.read.json(str(tmp_path / "out")).collect()}
    assert set(out) == {"P1", "P2"}
    assert out["P1"]["sex_at_birth"] == "Female"
    assert out["P2"]["sex_at_birth"] == "Unknown"


def test_streaming_exact_dedup_memory_sink(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    (src / "d.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "same words", "ts": "2026-01-01T00:00:00"},
                {"doc_id": 2, "text": "same  WORDS ", "ts": "2026-01-01T00:01:00"},
                {"doc_id": 3, "text": "different", "ts": "2026-01-01T00:02:00"},
            ]
        )
    )
    schema = "doc_id long, text string, ts timestamp"
    stream = spark.readStream.schema(schema).json(str(src))
    deduped = streaming_exact_dedup(
        stream, text_col="text", id_col="doc_id", event_time_col="ts"
    )
    name = f"dedup_sink_{int(time.time() * 1000)}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # docs 1 and 2 normalize to the same digest -> one survivor
    assert len(rows) == 2
    assert {r["content_hash"] for r in rows} == {
        rows[0]["content_hash"], rows[1]["content_hash"]
    }


def test_stateful_running_stats_survives_restart(spark, tmp_path):
    """applyInPandasWithState: per-key state persists in the checkpointed
    state store across two separate availableNow runs."""
    from c3dc_etl_spark.streaming.stateful import running_key_stats

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "pid string, value double"

    def run(tag):
        stream = spark.readStream.schema(schema).json(str(src))
        stats = running_key_stats(stream, key_col="pid", value_col="value")
        out_dir = tmp_path / f"out_{tag}"

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").json(str(out_dir))

        q = (
            stats.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r["key"]: r for r in spark.read.json(str(out_dir)).collect()}

    (src / "b1.json").write_text(
        '{"pid": "P1", "value": 1.0}\n{"pid": "P1", "value": 2.0}\n'
        '{"pid": "P2", "value": 3.0}\n'
    )
    out1 = run("a")
    assert out1["P1"]["n_records"] == 2 and out1["P1"]["value_total"] == 3.0
    assert out1["P2"]["n_records"] == 1

    (src / "b2.json").write_text('{"pid": "P1", "value": 4.0}\n')
    out2 = run("b")
    # only P1 had new input; its state accumulated across the restart
    assert out2["P1"]["n_records"] == 3 and out2["P1"]["value_total"] == 7.0
    assert "P2" not in out2


# -- pivoter (R1/R2/J2/O5/K5) ------------------------------------------------

def test_form_pivot_and_all_forms(spark, tmp_path):
    from c3dc_etl_spark.tools.pivoter import (
        all_forms_frame,
        form_wide_frames,
        write_csv_dir,
    )

    kv = spark.createDataFrame(
        [
            ("P1", "DEMO", "SEX", "F"),
            ("P1", "FU", "STATUS", "Alive"),
            ("P2", "DEMO", "SEX", "M"),
            ("P2", "DEMO", "AGE", "12"),
        ],
        "usi string, form_id string, key string, value string",
    )
    frames = form_wide_frames(
        kv, form_fields={"DEMO": ["SEX", "AGE"], "FU": ["STATUS"]}
    )
    assert set(frames) == {"DEMO", "FU"}
    demo = {r["usi"]: r for r in frames["DEMO"].collect()}
    assert demo["P2"]["AGE"] == "12" and demo["P1"]["AGE"] is None

    wide = all_forms_frame(frames)
    assert wide.columns == ["usi", "AGE", "SEX", "STATUS"]  # O5 ordering
    rows = {r["usi"]: r for r in wide.collect()}
    assert rows["P1"]["STATUS"] == "Alive" and rows["P2"]["STATUS"] is None

    write_csv_dir({"DEMO": frames["DEMO"]}, str(tmp_path / "sheets"))
    back = spark.read.option("header", True).csv(str(tmp_path / "sheets" / "DEMO"))
    assert back.count() == 2


def test_flatten_json_frame(spark):
    from c3dc_etl_spark.tools.pivoter import flatten_json_frame

    df = spark.createDataFrame(
        [
            (
                "P1",
                {"city": "x", "zip": "1"},
                [{"dx": "a"}, {"dx": "b"}],
                ["t1", "t2"],
            )
        ],
        "usi string, addr struct<city:string, zip:string>, "
        "dxs array<struct<dx:string>>, tags array<string>",
    )
    flat = flatten_json_frame(df)
    rows = flat.collect()
    assert len(rows) == 2  # list-of-structs explodes
    cols = set(flat.columns)
    assert {"addr.city", "addr.zip", "dxs.dx", "tags"} <= cols
    assert rows[0]["tags"] == "t1\r\nt2"  # list-of-scalars joins
    assert {r["dxs.dx"] for r in rows} == {"a", "b"}


def test_windowed_event_counts(spark, tmp_path):
    from c3dc_etl_spark.streaming import windowed_event_counts

    src = tmp_path / "evts"
    src.mkdir()
    (src / "e.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": "a", "ts": "2026-01-01T00:10:00"},
                {"k": "a", "ts": "2026-01-01T00:40:00"},
                {"k": "b", "ts": "2026-01-01T00:50:00"},
                {"k": "a", "ts": "2026-01-01T01:10:00"},
            ]
        )
    )
    ckpt = str(tmp_path / "winckpt")
    out_dir = tmp_path / "winout"

    def run():
        stream = spark.readStream.schema("k string, ts timestamp").json(str(src))
        counts = windowed_event_counts(
            stream, event_time_col="ts", key_col="k", window_duration="1 hour"
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").json(str(out_dir))

        q = (
            counts.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(60)

    run()
    # append mode emits a window only once the watermark passes its end;
    # a later batch advances event time far enough to close all three
    (src / "late.json").write_text(json.dumps({"k": "z", "ts": "2026-01-01T05:00:00"}))
    run()
    rows = {
        (str(r["window_start"])[:16].replace("T", " "), r["k"]): r["n_events"]
        for r in spark.read.json(str(out_dir)).collect()
    }
    assert rows == {
        ("2026-01-01 00:00", "a"): 2,
        ("2026-01-01 00:00", "b"): 1,
        ("2026-01-01 01:00", "a"): 1,
    }


def test_streaming_incremental_dedup_foreachbatch(spark, tmp_path):
    import json as _json

    from c3dc_etl_spark.streaming.arrivals import start_incremental_dedup_run

    base_text = "the quick brown fox jumps over the lazy dog again and again"
    base = spark.createDataFrame(
        [(0, base_text), (1, "some other established corpus document here")],
        ["id", "txt"],
    )
    src = tmp_path / "deltas"
    src.mkdir()
    (src / "batch0.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in [
                {"id": 100, "txt": base_text},  # dup of base doc 0
                {"id": 101, "txt": "entirely novel words never seen before xyz"},
            ]
        )
    )
    stream = spark.readStream.schema("id long, txt string").json(str(src))
    got: list[tuple] = []

    def sink(pairs, epoch_id):
        got.extend(
            (r["id_new"], r["id_base"], r["est_jaccard"]) for r in pairs.collect()
        )

    q = start_incremental_dedup_run(
        stream,
        base,
        text_col="txt",
        id_col="id",
        sink=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        shingle_k=5,
        num_hashes=8,
        bands=4,
    )
    q.awaitTermination(120)
    assert (100, 0, 1.0) in got  # the delta dup pairs with its base twin
    new_ids = {p[0] for p in got}
    assert 101 not in new_ids  # novel doc produces no candidates
    assert all(p[0] >= 100 for p in got)  # never base-vs-base


def test_streaming_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Restarting from the same checkpoint must process ONLY files that
    arrived since the last run: the file-source offsets live in the
    checkpoint, so a resumed availableNow pass skips everything already
    committed — re-running never duplicates output (the exactly-once
    resume contract a production ingest relies on)."""
    import json as _json

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def arrive(name, rows):
        p = src / name
        p.write_text("\n".join(_json.dumps(r) for r in rows))

    def drain():
        sq = (
            spark.readStream.schema("k string, v long")
            .json(str(src))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()

    arrive("f1.json", [{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "c", "v": 3}])
    drain()
    assert spark.read.parquet(str(out)).count() == 3
    arrive("f2.json", [{"k": "d", "v": 4}, {"k": "e", "v": 5}])
    drain()
    got = spark.read.parquet(str(out))
    assert got.count() == 5  # 3 + 2, NOT 3 + 5: f1 was not reprocessed
    assert {r["k"] for r in got.collect()} == {"a", "b", "c", "d", "e"}
