"""Avro codec certification (sources/avro_codec.py).

Cross-implementation layer: avro-java 1.12 ships on the Spark JVM
classpath, so — exactly like the ImageIO and protobuf-java patterns —
our container files must read correctly in the REFERENCE
implementation (org.apache.avro.file.DataFileReader) and avro-java's
files (null and deflate codecs) must read correctly here. Plus
ours↔ours roundtrips for the full supported type lattice and a
hypothesis property over optional-field records.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postrack_spark.sources.avro_codec import (
    read_avro,
    spark_schema_to_avro,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "flag", "type": "boolean"},
    ],
}

ROWS = [
    {"k": 0, "s": "alpha", "d": 1.5, "flag": True},
    {"k": -7, "s": None, "d": -0.25, "flag": False},
    {"k": 2**62, "s": "βγ utf8", "d": 0.0, "flag": True},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_ours_to_ours(codec):
    blob = write_avro(ROWS, SCHEMA, codec=codec)
    got, schema = read_avro(blob)
    assert got == ROWS
    assert schema == SCHEMA


def test_nested_record_array_map_bytes_roundtrip():
    schema = {
        "type": "record", "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {"name": "payload", "type": "bytes"},
            {"name": "inner", "type": {
                "type": "record", "name": "pt",
                "fields": [{"name": "x", "type": "int"},
                           {"name": "y", "type": "int"}]}},
        ],
    }
    rows = [
        {"id": 1, "tags": ["a", "b"], "attrs": {"n": 3},
         "payload": b"\x00\xff", "inner": {"x": -1, "y": 2}},
        {"id": 2, "tags": [], "attrs": {},
         "payload": b"", "inner": {"x": 0, "y": 0}},
    ]
    got, _ = read_avro(write_avro(rows, schema, codec="deflate"))
    assert got == rows


def test_enum_and_unknown_codec_raise():
    with pytest.raises(NotImplementedError, match="enum|fixed|out of scope"):
        write_avro([{"e": "A"}], {
            "type": "record", "name": "r",
            "fields": [{"name": "e", "type": {
                "type": "enum", "name": "E", "symbols": ["A"]}}]})
    with pytest.raises(NotImplementedError, match="codec"):
        write_avro(ROWS, SCHEMA, codec="snappy")


_maybe_text = st.one_of(st.none(), st.text(max_size=20))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(-(2**63), 2**63 - 1), _maybe_text,
                          st.booleans()), max_size=30))
def test_roundtrip_property(rows):
    recs = [{"k": k, "s": s, "d": float(k % 7), "flag": f}
            for k, s, f in rows]
    got, _ = read_avro(write_avro(recs, SCHEMA, codec="deflate",
                                  block_records=7))
    assert got == recs


# ------------------------------------------------ cross: avro-java


@pytest.fixture(scope="module")
def javro(spark):
    jvm = spark._jvm

    def read_with_java(blob: bytes):
        fin = jvm.org.apache.avro.file.SeekableByteArrayInput(blob)
        reader = jvm.org.apache.avro.file.DataFileReader(
            fin, jvm.org.apache.avro.generic.GenericDatumReader())
        out = []
        while reader.hasNext():
            rec = reader.next()
            row = {}
            for f in ["k", "s", "d", "flag"]:
                v = rec.get(f)
                if v is not None and f == "s":
                    v = v.toString()
                row[f] = v
            out.append(row)
        reader.close()
        return out

    def write_with_java(rows, codec: str) -> bytes:
        import json as _json

        schema = jvm.org.apache.avro.Schema.Parser().parse(
            _json.dumps(SCHEMA))
        writer = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(schema))
        if codec == "deflate":
            writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
        baos = jvm.java.io.ByteArrayOutputStream()
        writer.create(schema, baos)
        for r in rows:
            rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
            rec.put("k", r["k"])
            rec.put("s", r["s"])
            rec.put("d", float(r["d"]))
            rec.put("flag", bool(r["flag"]))
            writer.append(rec)
        writer.close()
        return bytes(baos.toByteArray())

    return read_with_java, write_with_java


def test_java_reads_our_files(javro):
    read_with_java, _ = javro
    for codec in ("null", "deflate"):
        got = read_with_java(write_avro(ROWS, SCHEMA, codec=codec))
        assert got == ROWS, codec


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_we_read_java_files(javro, codec):
    _, write_with_java = javro
    blob = write_with_java(ROWS, codec)
    got, schema = read_avro(blob)
    assert got == ROWS
    assert [f["name"] for f in schema["fields"]] == ["k", "s", "d", "flag"]


def test_spark_schema_mapping(spark):
    df = spark.range(1).selectExpr(
        "id AS k", "CAST(NULL AS STRING) AS s", "CAST(1.5 AS DOUBLE) AS d",
        "true AS flag")
    avs = spark_schema_to_avro(df.schema)
    assert avs["fields"][0]["type"] in ("long", ["null", "long"])
    blob = write_avro(
        [{"k": 1, "s": None, "d": 1.5, "flag": True}], avs)
    got, _ = read_avro(blob)
    assert got[0]["d"] == 1.5
