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


def test_named_type_references_inline():
    """The spec lets a schema define a record/enum/fixed once and
    reference it by name later — DataFileWriter emits this whenever
    two fields share a type. All three walkers must see the
    definition at every use site."""
    import json

    from hyppo_worker_spark.sources.avro_schema import (
        avro_to_struct,
        special_codecs,
    )

    schema = json.dumps({
        "type": "record", "name": "top",
        "fields": [
            {"name": "a",
             "type": {"type": "enum", "name": "color",
                      "symbols": ["R", "G", "B"]}},
            {"name": "b", "type": "color"},  # bare-name reference
            {"name": "p",
             "type": {"type": "record", "name": "point", "fields": [
                 {"name": "x", "type": "long"},
                 {"name": "y", "type": "long"},
             ]}},
            {"name": "q", "type": "point"},
            {"name": "t",
             "type": {"type": "fixed", "name": "t8", "size": 8}},
            {"name": "u", "type": ["null", "t8"]},  # ref inside union
        ],
    })
    st = avro_to_struct(schema)
    assert st["b"].dataType == st["a"].dataType  # both enums -> string
    assert st["q"].dataType == st["p"].dataType
    sp = special_codecs(schema)
    assert sp["a"] == ("enum", ["R", "G", "B"])
    assert sp["b"] == ("enum", ["R", "G", "B"])  # via the reference
    assert sp["t"] == ("fixed", 8)
    assert sp["u"] == ("fixed", 8)


def test_namespaced_reference_resolves():
    import json

    from hyppo_worker_spark.sources.avro_schema import special_codecs

    schema = json.dumps({
        "type": "record", "name": "top", "namespace": "com.x",
        "fields": [
            {"name": "a",
             "type": {"type": "enum", "name": "e",
                      "symbols": ["S"]}},
            {"name": "b", "type": "com.x.e"},  # fully-qualified ref
        ],
    })
    assert special_codecs(schema)["b"] == ("enum", ["S"])


def test_recursive_named_type_raises():
    import json

    import pytest

    from hyppo_worker_spark.sources.avro_schema import (
        AvroSchemaError,
        avro_to_struct,
    )

    schema = json.dumps({
        "type": "record", "name": "node",
        "fields": [
            {"name": "next", "type": ["null", "node"]},
        ],
    })
    with pytest.raises(AvroSchemaError, match="recursive"):
        avro_to_struct(schema)
