"""Avro schema resolution (spec "Schema Resolution"): files written
under OLD schemas decode under an evolved reader schema — writer-only
fields dropped, reader-only fields filled from declared defaults,
primitive promotions (int->long/float/double, float->double,
string<->bytes), enum symbols resolved by name with the reader's
default as fallback. Failures (missing default, illegal promotion)
raise AvroSchemaError instead of silently mis-shaping rows."""

from __future__ import annotations

import json

import pytest

from hyppo_worker_spark.sources.avro_container import (
    read_container,
    write_container,
)
from hyppo_worker_spark.sources.avro_schema import (
    AvroSchemaError,
    avro_to_struct,
    schema_resolver,
)

V1 = json.dumps({
    "type": "record", "name": "doc",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "float"},
        {"name": "legacy_flag", "type": "boolean"},
        {"name": "status",
         "type": {"type": "enum", "name": "st",
                  "symbols": ["OK", "WARN"]}},
        {"name": "tags", "type": {"type": "array", "items": "int"}},
    ],
})
# v2: id promoted int->long, score float->double, legacy_flag dropped,
# lang added with default, status enum gained FAIL and a default,
# tags items promoted int->long
V2 = json.dumps({
    "type": "record", "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "lang", "type": "string", "default": "en"},
        {"name": "status",
         "type": {"type": "enum", "name": "st",
                  "symbols": ["OK", "WARN", "FAIL"], "default": "OK"}},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
        {"name": "note", "type": ["null", "string"], "default": None},
    ],
})

ROWS_V1 = [
    {"id": 1, "title": "a", "score": 1.5, "legacy_flag": True,
     "status": "OK", "tags": [1, 2]},
    {"id": 2, "title": "b", "score": -2.25, "legacy_flag": False,
     "status": "WARN", "tags": []},
]


def _v1_blob() -> bytes:
    schema = avro_to_struct(V1)
    return write_container(schema, ROWS_V1, codec="null", declared_schema=V1)


def test_old_file_resolves_under_evolved_reader():
    schema, codec, rows = read_container(_v1_blob(), reader_schema=V2)
    assert [f.name for f in schema.fields] == [
        "id", "title", "score", "lang", "status", "tags", "note"
    ]
    assert rows == [
        {"id": 1, "title": "a", "score": 1.5, "lang": "en",
         "status": "OK", "tags": [1, 2], "note": None},
        {"id": 2, "title": "b", "score": -2.25, "lang": "en",
         "status": "WARN", "tags": [], "note": None},
    ]
    assert all(isinstance(r["id"], int) for r in rows)
    assert all(isinstance(r["score"], float) for r in rows)


def test_new_file_under_same_reader_is_identity():
    schema2 = avro_to_struct(V2)
    rows2 = [{"id": 9, "title": "x", "score": 0.5, "lang": "fr",
              "status": "FAIL", "tags": [7], "note": "n"}]
    blob = write_container(schema2, rows2, codec="null", declared_schema=V2)
    _, _, rows = read_container(blob, reader_schema=V2)
    assert rows == rows2


def test_enum_symbol_unknown_to_reader_uses_default():
    w = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "s",
                    "type": {"type": "enum", "name": "e",
                             "symbols": ["A", "B", "NEW"]}}],
    })
    r_with_default = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "s",
                    "type": {"type": "enum", "name": "e",
                             "symbols": ["A", "B"], "default": "A"}}],
    })
    r_without = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "s",
                    "type": {"type": "enum", "name": "e",
                             "symbols": ["A", "B"]}}],
    })
    blob = write_container(
        avro_to_struct(w), [{"s": "NEW"}, {"s": "B"}],
        codec="null", declared_schema=w,
    )
    _, _, rows = read_container(blob, reader_schema=r_with_default)
    assert [r["s"] for r in rows] == ["A", "B"]
    conv = schema_resolver(w, r_without)
    with pytest.raises(AvroSchemaError, match="no default"):
        conv({"s": "NEW"})


def test_string_bytes_promotions_both_ways():
    w = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "a", "type": "string"},
                               {"name": "b", "type": "bytes"}]})
    r = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "a", "type": "bytes"},
                               {"name": "b", "type": "string"}]})
    conv = schema_resolver(w, r)
    assert conv({"a": "hi", "b": b"yo"}) == {"a": b"hi", "b": "yo"}


def test_missing_default_and_illegal_promotion_raise():
    w = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "a", "type": "long"}]})
    r_missing = json.dumps({"type": "record", "name": "r",
                            "fields": [{"name": "a", "type": "long"},
                                       {"name": "zz", "type": "string"}]})
    with pytest.raises(AvroSchemaError, match="no default"):
        schema_resolver(w, r_missing)
    r_demote = json.dumps({"type": "record", "name": "r",
                           "fields": [{"name": "a", "type": "int"}]})
    with pytest.raises(AvroSchemaError, match="promote"):
        schema_resolver(w, r_demote)


def test_one_sided_logical_type_is_a_mismatch_not_a_promotion():
    # A logicalType on only one side must NOT fall through to the
    # primitive-promotion lattice: writer plain long -> reader
    # timestamp-millis would hand raw ints to a timestamp column, and
    # writer bytes-decimal -> reader string would crash decoding a
    # Decimal. Both are schema mismatches and must raise.
    w_long = json.dumps({"type": "record", "name": "r",
                         "fields": [{"name": "a", "type": "long"}]})
    r_ts = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": {
            "type": "long", "logicalType": "timestamp-millis"}}],
    })
    with pytest.raises(AvroSchemaError, match="logicalType mismatch"):
        schema_resolver(w_long, r_ts)
    # and the reverse direction (writer logical, reader plain)
    with pytest.raises(AvroSchemaError, match="logicalType mismatch"):
        schema_resolver(r_ts, w_long)

    w_dec = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": {
            "type": "bytes", "logicalType": "decimal",
            "precision": 10, "scale": 2}}],
    })
    r_str = json.dumps({"type": "record", "name": "r",
                        "fields": [{"name": "a", "type": "string"}]})
    with pytest.raises(AvroSchemaError, match="logicalType mismatch"):
        schema_resolver(w_dec, r_str)

    # same logicalType on both sides still resolves (forced through
    # _resolver, not the whole-schema identity fast path, by a
    # reader-only defaulted field)
    r_ts_plus = json.dumps({
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": {
                "type": "long", "logicalType": "timestamp-millis"}},
            {"name": "z", "type": "string", "default": "d"},
        ],
    })
    conv = schema_resolver(r_ts, r_ts_plus)
    import datetime
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert conv({"a": ts}) == {"a": ts, "z": "d"}


def test_nullable_reader_accepts_non_nullable_writer():
    w = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "a", "type": "int"}]})
    r = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "a", "type": ["null", "long"]}]})
    conv = schema_resolver(w, r)
    assert conv({"a": 3}) == {"a": 3}
    # ...but a nullable writer cannot resolve to a non-nullable reader
    with pytest.raises(AvroSchemaError, match="non-nullable"):
        schema_resolver(r, w)


def test_distributed_resolving_read_across_mixed_versions(spark, tmp_path):
    """A zone holding files from BOTH schema versions reads as one
    DataFrame under the v2 reader — per-file resolution from each
    file's own header."""
    import os

    from hyppo_worker_spark.sources.avro_container import (
        read_avro,
        write_avro,
    )

    out = str(tmp_path / "zone")
    os.makedirs(out)
    with open(os.path.join(out, "old.avro"), "wb") as fh:
        fh.write(_v1_blob())
    df2 = spark.createDataFrame(
        [(9, "x", 0.5, "fr", "FAIL", [7], "n")], avro_to_struct(V2)
    )
    write_avro(df2, out, codec="null", declared_schema=V2)

    back = read_avro(spark, out, reader_schema=V2)
    got = {
        (r.id, r.title, r.score, r.lang, r.status, tuple(r.tags), r.note)
        for r in back.collect()
    }
    assert got == {
        (1, "a", 1.5, "en", "OK", (1, 2), None),
        (2, "b", -2.25, "en", "WARN", (), None),
        (9, "x", 0.5, "fr", "FAIL", (7,), "n"),
    }


# -- property: random evolutions resolve correctly (no Spark needed) ------

from hypothesis import given, settings
from hypothesis import strategies as st

_PRIM_POOL = ["int", "long", "float", "double", "string", "bytes", "boolean"]
_PROMOTE = {
    "int": ["int", "long", "float", "double"],
    "long": ["long", "float", "double"],
    "float": ["float", "double"],
    "double": ["double"],
    "string": ["string", "bytes"],
    "bytes": ["bytes", "string"],
    "boolean": ["boolean"],
}
_DEFAULTS = {
    "int": 7, "long": 7, "float": 0.5, "double": 0.5,
    "string": "d", "bytes": "d", "boolean": True,
}
_VALUES = {
    "int": st.integers(-2**31, 2**31 - 1),
    "long": st.integers(-2**53, 2**53),
    "float": st.sampled_from([0.0, 1.5, -2.25, 1024.0]),
    "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "string": st.text(max_size=8),
    "bytes": st.binary(max_size=8),
    "boolean": st.booleans(),
}


@st.composite
def _evolution(draw):
    n = draw(st.integers(2, 6))
    fields = []
    for i in range(n):
        t = draw(st.sampled_from(_PRIM_POOL))
        fields.append((f"f{i}", t))
    # reader: each writer field either kept (possibly promoted) or
    # dropped; plus 0-2 added fields with defaults
    reader_fields = []
    for name, t in fields:
        if draw(st.booleans()):
            reader_fields.append((name, draw(st.sampled_from(_PROMOTE[t]))))
    for j in range(draw(st.integers(0, 2))):
        t = draw(st.sampled_from(_PRIM_POOL))
        reader_fields.append((f"added{j}", t))
    rows = [
        {name: draw(_VALUES[t]) for name, t in fields}
        for _ in range(draw(st.integers(1, 4)))
    ]
    return fields, reader_fields, rows


@settings(max_examples=60, deadline=None)
@given(_evolution())
def test_random_primitive_evolutions_resolve(case):
    fields, reader_fields, rows = case
    writer = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": n, "type": t} for n, t in fields],
    })
    rdict = {
        "type": "record", "name": "r",
        "fields": [
            {"name": n, "type": t}
            | ({"default": _DEFAULTS[t]} if n.startswith("added") else {})
            for n, t in reader_fields
        ],
    }
    reader = json.dumps(rdict)
    blob = write_container(
        avro_to_struct(writer), rows, codec="null", declared_schema=writer
    )
    _, _, got = read_container(blob, reader_schema=reader)
    wtypes = dict(fields)
    for src, out in zip(rows, got):
        assert set(out) == {n for n, _ in reader_fields}
        for name, rt in reader_fields:
            if name.startswith("added"):
                want = _DEFAULTS[rt]
                if rt == "bytes":
                    want = b"d"
                assert out[name] == want
                continue
            v = src[name]
            wt = wtypes[name]
            if rt in ("float", "double") and wt in ("int", "long",
                                                    "float", "double"):
                assert out[name] == float(v)
            elif wt == "string" and rt == "bytes":
                assert out[name] == v.encode()
            elif wt == "bytes" and rt == "string":
                # non-UTF-8 bytes are legal bytes values; the
                # promotion matches Avro Java's Utf8 replacement
                # decoding (hypothesis found b'\x80' here)
                assert out[name] == v.decode("utf-8", errors="replace")
            else:
                assert out[name] == v
