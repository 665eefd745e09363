"""Avro ↔ StructType bridge, pinned to the reference's TestRecord
shape (``worker/src/test/java/com/harrys/hyppo/worker/rt/data/TestRecord.java:10``,
documented in FIXTURES.md F1)."""

import json

import pytest
from pyspark.sql import types as T

from hyppo_worker_spark.sources.avro_schema import (
    AvroSchemaError,
    avro_to_struct,
    struct_to_avro,
)

TEST_RECORD = json.dumps(
    {
        "type": "record",
        "name": "TestRecord",
        "namespace": "io.ingestion.worker.rt.data",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "valueOne", "type": ["int", "null"]},
            {"name": "valueTwo", "type": ["long", "null"]},
        ],
    }
)


def test_test_record_to_struct():
    st = avro_to_struct(TEST_RECORD)
    assert st == T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("valueOne", T.IntegerType(), True),
            T.StructField("valueTwo", T.LongType(), True),
        ]
    )


def test_round_trip_struct_avro_struct():
    st = T.StructType(
        [
            T.StructField("s", T.StringType(), False),
            T.StructField("i", T.IntegerType(), True),
            T.StructField("arr", T.ArrayType(T.DoubleType(), False), True),
            T.StructField("m", T.MapType(T.StringType(), T.LongType(), True), True),
            T.StructField(
                "nested",
                T.StructType([T.StructField("b", T.BooleanType(), True)]),
                False,
            ),
        ]
    )
    assert avro_to_struct(struct_to_avro(st)) == st


def test_nested_record_names_are_unique():
    """Avro requires unique record names within a schema: two struct
    fields must not both emit a record named "record"."""
    st = T.StructType(
        [
            T.StructField(
                "a", T.StructType([T.StructField("x", T.IntegerType(), True)]), True
            ),
            T.StructField(
                "b", T.StructType([T.StructField("y", T.LongType(), True)]), True
            ),
        ]
    )
    schema = json.loads(struct_to_avro(st))

    names = []

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "record":
                names.append(node["name"])
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(schema)
    assert len(names) == len(set(names)), f"duplicate record names: {names}"
    assert avro_to_struct(json.dumps(schema)) == st


def test_logical_types():
    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
                {
                    "name": "dec",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 12,
                        "scale": 3,
                    },
                },
            ],
        }
    )
    st = avro_to_struct(schema)
    assert st["ts"].dataType == T.TimestampType()
    assert st["d"].dataType == T.DateType()
    assert st["dec"].dataType == T.DecimalType(12, 3)


def test_rejects_non_record_top_level():
    with pytest.raises(AvroSchemaError):
        avro_to_struct('"string"')


def test_rejects_multi_branch_union():
    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [{"name": "u", "type": ["int", "string", "null"]}],
        }
    )
    with pytest.raises(AvroSchemaError):
        avro_to_struct(schema)
