"""Hand-assemble golden Avro Object Container Files byte-by-byte from
the PUBLIC Avro 1.11 spec (https://avro.apache.org/docs/1.11.1/specification/
— "Object Container Files", "Binary encoding"), independently of
``sources/avro_container.py``'s encoder: no function from the engine is
used to produce fixture bytes. The fixtures are CHECKED IN; this script
regenerates them deterministically (``python tests/fixtures/make_avro_goldens.py``).

These convert the container reader's correctness claim from
"self-consistent round-trips" to "decodes independently-assembled
spec bytes" — the cross-library interop stand-in while no second Avro
implementation (fastavro/avro) exists in the environment.

Spec facts used, with hand-checked examples:
- long/int: zigzag then base-128 varint, little-endian groups,
  high bit = continuation. zigzag(0)=0x00, zigzag(-1)=0x01,
  zigzag(1)=0x02, zigzag(2)=0x04, zigzag(-64)=0x7f,
  zigzag(64)=0x80 0x01.
- string/bytes: long length prefix + raw bytes.
- double: 8-byte IEEE-754 little-endian; float: 4-byte.
- union: long index into the DECLARED branch list, then the value.
- array/map: series of blocks — long count, items (map: key string +
  value), terminated by count 0. (Negative count variant unused here.)
- container: magic b"Obj\\x01", file metadata map (avro.schema,
  avro.codec), 16-byte sync marker; then per block: long record
  count, long byte size, serialized records (deflate codec: raw zlib,
  i.e. RFC 1951 with no zlib header), sync marker.
"""

from __future__ import annotations

import datetime
import json
import os
import struct
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))


def vlong(n: int) -> bytes:
    """Avro long: zigzag + base-128 varint (independent implementation;
    see hand-checked byte examples in the module docstring)."""
    z = 2 * n if n >= 0 else -2 * n - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def avstr(s: str) -> bytes:
    b = s.encode()
    return vlong(len(b)) + b


def avbytes(b: bytes) -> bytes:
    return vlong(len(b)) + b


def meta_map(schema_json: str, codec: str) -> bytes:
    out = bytearray()
    out += vlong(2)
    out += avstr("avro.codec") + avbytes(codec.encode())
    out += avstr("avro.schema") + avbytes(schema_json.encode())
    out += vlong(0)
    return bytes(out)


def _compress(codec: str, body: bytes) -> bytes:
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        return comp.compress(body) + comp.flush()
    if codec == "bzip2":
        import bz2

        return bz2.compress(body)
    if codec == "xz":
        import lzma

        return lzma.compress(body, format=lzma.FORMAT_XZ)
    return body


def container(schema_json: str, codec: str, body: bytes, n_records: int,
              sync: bytes) -> bytes:
    assert len(sync) == 16
    body = _compress(codec, body)
    return (
        b"Obj\x01" + meta_map(schema_json, codec) + sync
        + vlong(n_records) + vlong(len(body)) + body + sync
    )


def multiblock_container(schema_json: str, codec: str,
                         blocks: list[tuple[int, bytes]],
                         sync: bytes) -> bytes:
    """Several (record_count, body) blocks, each framed and
    sync-terminated — a real writer emits one block per flush."""
    assert len(sync) == 16
    out = bytearray(b"Obj\x01" + meta_map(schema_json, codec) + sync)
    for n, body in blocks:
        body = _compress(codec, body)
        out += vlong(n) + vlong(len(body)) + body + sync
    return bytes(out)


SYNC = bytes(range(16))


# -- fixture 1/2: flat record, writer-convention [T,"null"] union ---------
FLAT_SCHEMA = json.dumps({
    "type": "record", "name": "flat",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["double", "null"]},
    ],
})
# row 1: a=3, b="hi", c=2.5  /  row 2: a=-1, b="", c=null
FLAT_BODY = (
    vlong(3) + avstr("hi") + vlong(0) + struct.pack("<d", 2.5)
    + vlong(-1) + avstr("") + vlong(1)
)


# -- fixture 3: nested array/map/record, mixed union orders ---------------
NESTED_SCHEMA = json.dumps({
    "type": "record", "name": "nested",
    "fields": [
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "s", "type": {
            "type": "record", "name": "inner",
            "fields": [
                {"name": "p", "type": "int"},
                {"name": "q", "type": ["string", "null"]},
            ],
        }},
    ],
})
NESTED_BODY = (
    # xs = [1, 2, 3]: one block of 3, then end
    vlong(3) + vlong(1) + vlong(2) + vlong(3) + vlong(0)
    # m = {"k": 7}
    + vlong(1) + avstr("k") + vlong(7) + vlong(0)
    # s = {p: 5, q: None}: q's union is ["string","null"] -> null idx 1
    + vlong(5) + vlong(1)
)


# -- fixture 4: FOREIGN ["null",T] unions + logical types ------------------
FOREIGN_SCHEMA = json.dumps({
    "type": "record", "name": "foreign",
    "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "dec",
         "type": {"type": "bytes", "logicalType": "decimal",
                  "precision": 9, "scale": 2}},
        {"name": "n", "type": ["null", "long"]},
        {"name": "arr",
         "type": {"type": "array", "items": ["null", "string"]}},
    ],
})
_D = (datetime.date(2024, 1, 29) - datetime.date(1970, 1, 1)).days
_TS = 1704067200000000  # 2024-01-01T00:00:00Z in micros
FOREIGN_BODY = (
    # row 1: d=2024-01-29, ts, dec=123.45 (unscaled 12345 big-endian
    # two's complement minimal = 0x30 0x39), n=None (branch 0 of
    # ["null","long"]), arr=["x", None]
    vlong(_D) + vlong(_TS) + avbytes((12345).to_bytes(2, "big", signed=True))
    + vlong(0)
    + vlong(2) + vlong(1) + avstr("x") + vlong(0) + vlong(0)
    # row 2: d epoch day 0, ts=0, dec=-1.00 (unscaled -100 = 0x9C),
    # n=42 (branch 1 then value), arr=[]
    + vlong(0) + vlong(0) + avbytes((-100).to_bytes(1, "big", signed=True))
    + vlong(1) + vlong(42)
    + vlong(0)
)


# -- fixture: enum + fixed — sites whose encoding differs from their
# Spark mapping (enum -> string but encoded as a zigzag symbol INDEX;
# fixed -> binary but encoded as raw N bytes with NO length prefix)
ENUMFIXED_SCHEMA = json.dumps({
    "type": "record", "name": "ef",
    "fields": [
        {"name": "status",
         "type": {"type": "enum", "name": "st",
                  "symbols": ["OK", "WARN", "FAIL"]}},
        {"name": "tag", "type": {"type": "fixed", "name": "t4", "size": 4}},
        {"name": "note",
         "type": ["null", {"type": "enum", "name": "nt",
                           "symbols": ["A", "B"]}]},
        {"name": "arr",
         "type": {"type": "array",
                  "items": {"type": "enum", "name": "lv",
                            "symbols": ["LOW", "MID", "HIGH"]}}},
    ],
})
ENUMFIXED_BODY = (
    # row 1: status=FAIL (idx 2), tag=4 raw bytes, note=A (branch 1 of
    # ["null",enum], then idx 0), arr=[MID, LOW]
    vlong(2) + b"\xde\xad\xbe\xef" + vlong(1) + vlong(0)
    + vlong(2) + vlong(1) + vlong(0) + vlong(0)
    # row 2: status=OK, tag="ABCD", note=null (branch 0), arr=[]
    + vlong(0) + b"ABCD" + vlong(0) + vlong(0)
)


# -- fixture: named type reference — "level2" is DEFINED at field a
# and REFERENCED by name at field b (how DataFileWriter emits shared
# types); both sites must decode as enum indices
NAMEDREF_SCHEMA = json.dumps({
    "type": "record", "name": "nr",
    "fields": [
        {"name": "a",
         "type": {"type": "enum", "name": "level2",
                  "symbols": ["LO", "HI"]}},
        {"name": "b", "type": "level2"},
    ],
})
NAMEDREF_BODY = (
    vlong(1) + vlong(0)   # row 1: a=HI, b=LO
    + vlong(0) + vlong(1)  # row 2: a=LO, b=HI
)


# -- fixture: fixed-with-decimal — the spec lets logicalType decimal
# annotate FIXED as well as bytes; the site maps to DecimalType but
# the wire form stays exactly `size` raw bytes (big-endian
# two's-complement unscaled int), NOT the length-prefixed
# bytes-decimal encoding. A bytes-decimal field sits alongside for
# contrast, plus a nullable fixed-decimal union.
FIXDEC_SCHEMA = json.dumps({
    "type": "record", "name": "fd",
    "fields": [
        {"name": "price",
         "type": {"type": "fixed", "name": "p4", "size": 4,
                  "logicalType": "decimal", "precision": 9, "scale": 2}},
        {"name": "fee",
         "type": {"type": "bytes", "logicalType": "decimal",
                  "precision": 9, "scale": 2}},
        {"name": "adj",
         "type": ["null", {"type": "fixed", "name": "a2", "size": 2,
                           "logicalType": "decimal", "precision": 4,
                           "scale": 1}]},
    ],
})
FIXDEC_BODY = (
    # row 1: price=123.45 (unscaled 12345 in 4 bytes big-endian),
    # fee=9.99 (bytes-decimal: length prefix + minimal bytes),
    # adj=-0.5 (branch 1, unscaled -5 in 2 bytes)
    (12345).to_bytes(4, "big", signed=True)
    + avbytes((999).to_bytes(2, "big", signed=True))
    + vlong(1) + (-5).to_bytes(2, "big", signed=True)
    # row 2: price=-1.00 (unscaled -100 in 4 bytes), fee=0.00,
    # adj=null (branch 0)
    + (-100).to_bytes(4, "big", signed=True)
    + avbytes((0).to_bytes(1, "big", signed=True))
    + vlong(0)
)


# -- fixture: namespace shadowing — two enums share the bare name
# "sym" in namespaces ns1 and ns2; per the spec's name-resolution
# rule a bare reference resolves in the ENCLOSING namespace, so
# field b's "sym" (inside the ns2 child record) means ns2.sym while
# field c's "sym" (back at the ns1 outer record) means ns1.sym, and
# field d references ns1.sym by fullname from inside ns2.
NAMESPACED_SCHEMA = json.dumps({
    "type": "record", "name": "outer", "namespace": "ns1",
    "fields": [
        {"name": "a",
         "type": {"type": "enum", "name": "sym",
                  "symbols": ["N1A", "N1B"]}},
        {"name": "child",
         "type": {"type": "record", "name": "inner", "namespace": "ns2",
                  "fields": [
                      {"name": "b",
                       "type": {"type": "enum", "name": "sym",
                                "symbols": ["N2X", "N2Y", "N2Z"]}},
                      {"name": "b2", "type": "sym"},
                      {"name": "d", "type": "ns1.sym"},
                  ]}},
        {"name": "c", "type": "sym"},
    ],
})
NAMESPACED_BODY = (
    # row 1: a=N1B(1), child={b=N2Z(2), b2=N2X(0), d=N1A(0)}, c=N1A(0)
    vlong(1) + vlong(2) + vlong(0) + vlong(0) + vlong(0)
    # row 2: a=N1A(0), child={b=N2Y(1), b2=N2Z(2), d=N1B(1)}, c=N1B(1)
    + vlong(0) + vlong(1) + vlong(2) + vlong(1) + vlong(1)
)


def main() -> None:
    fixtures = {
        "golden_null_flat.avro":
            container(FLAT_SCHEMA, "null", FLAT_BODY, 2, SYNC),
        "golden_deflate_flat.avro":
            container(FLAT_SCHEMA, "deflate", FLAT_BODY, 2, SYNC),
        "golden_nested.avro":
            container(NESTED_SCHEMA, "null", NESTED_BODY, 1, SYNC),
        "golden_foreign_unions.avro":
            container(FOREIGN_SCHEMA, "null", FOREIGN_BODY, 2, SYNC),
        # three blocks (2 + 1 + 2 records), deflate codec: exercises
        # the block-framing loop + per-block sync verification with
        # independently-compressed bodies
        "golden_enum_fixed.avro":
            container(ENUMFIXED_SCHEMA, "null", ENUMFIXED_BODY, 2, SYNC),
        "golden_named_reference.avro":
            container(NAMEDREF_SCHEMA, "null", NAMEDREF_BODY, 2, SYNC),
        "golden_fixed_decimal.avro":
            container(FIXDEC_SCHEMA, "null", FIXDEC_BODY, 2, SYNC),
        "golden_namespaced.avro":
            container(NAMESPACED_SCHEMA, "null", NAMESPACED_BODY, 2, SYNC),
        "golden_bzip2_flat.avro":
            container(FLAT_SCHEMA, "bzip2", FLAT_BODY, 2, SYNC),
        "golden_xz_flat.avro":
            container(FLAT_SCHEMA, "xz", FLAT_BODY, 2, SYNC),
        "golden_multiblock.avro": multiblock_container(
            FLAT_SCHEMA, "deflate",
            [
                (2, FLAT_BODY),
                (1, vlong(7) + avstr("solo") + vlong(0)
                    + struct.pack("<d", -0.5)),
                (2, FLAT_BODY),
            ],
            SYNC,
        ),
    }
    for name, data in fixtures.items():
        with open(os.path.join(HERE, name), "wb") as fh:
            fh.write(data)
        print(f"{name}: {len(data)} bytes")

    # the WRITER golden: our write_container output for a fixed input,
    # checked in so any byte-level drift of the emitter is caught
    import sys

    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from pyspark.sql import types as T

    from hyppo_worker_spark.sources.avro_container import write_container

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ])
    rows = [
        {"id": 1, "name": "alpha", "score": 1.5},
        {"id": 2, "name": None, "score": None},
        {"id": 3, "name": "gamma", "score": -2.25},
    ]
    out = write_container(schema, rows, codec="null")
    with open(os.path.join(HERE, "golden_writer_output.avro"), "wb") as fh:
        fh.write(out)
    print(f"golden_writer_output.avro: {len(out)} bytes")


if __name__ == "__main__":
    main()
