"""Pure-Python Avro Object Container File implementation: spec-level
byte checks (zigzag varints, header framing, sync markers), both
codecs, null handling, and the distributed mapInPandas read/write
round trip. This closes the reference-parity gap (its records zone IS
Avro-with-deflate) without the absent spark-avro jar."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyppo_worker_spark.sources import avro_container as AC

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

ROWS = [
    {"id": 0, "name": "a", "score": 1.5, "ok": True},
    {"id": -1, "name": None, "score": None, "ok": False},
    {"id": 2**40, "name": "unicode éè", "score": -0.25, "ok": True},
]


def test_zigzag_matches_spec_vectors():
    # Avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04,
    # -64->7f, 64->80 01
    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for n, b in vectors.items():
        assert AC.zigzag_encode(n) == b, n
        v, pos = AC.zigzag_decode(memoryview(b), 0)
        assert (v, pos) == (n, len(b))


def test_header_layout_and_sync_framing():
    blob = AC.write_container(SCHEMA, ROWS, codec="null")
    assert blob[:4] == b"Obj\x01"
    schema, codec, rows = AC.read_container(blob)
    assert codec == "null"
    assert rows == ROWS
    # corrupting a sync marker must be detected, not silently skipped
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        AC.read_container(bytes(bad))


def test_deflate_codec_is_raw_rfc1951():
    blob = AC.write_container(SCHEMA, ROWS, codec="deflate")
    schema, codec, rows = AC.read_container(blob)
    assert codec == "deflate"
    assert rows == ROWS
    # the block payload must be RAW deflate (no zlib wrapper): find
    # the block after the header sync and inflate it with wbits=-15
    null_blob = AC.write_container(SCHEMA, ROWS, codec="null")
    # headers differ only in the avro.codec value; locate sync via md5
    from hyppo_worker_spark.sources.avro_schema import struct_to_avro

    sync = AC._sync_marker(struct_to_avro(SCHEMA))
    body_start = blob.index(sync) + 16
    mv = memoryview(blob)
    _, p = AC.zigzag_decode(mv, body_start)  # record count
    size, p = AC.zigzag_decode(mv, p)
    raw = bytes(mv[p : p + size])
    null_body_start = null_blob.index(sync) + 16
    mvn = memoryview(null_blob)
    _, pn = AC.zigzag_decode(mvn, null_body_start)
    nsize, pn = AC.zigzag_decode(mvn, pn)
    assert zlib.decompress(raw, wbits=-15) == bytes(mvn[pn : pn + nsize])


def test_multi_block_round_trip():
    rows = [{"id": i, "name": f"r{i}", "score": i / 4, "ok": i % 2 == 0}
            for i in range(1000)]
    blob = AC.write_container(SCHEMA, rows, codec="deflate", block_records=128)
    _, _, back = AC.read_container(blob)
    assert back == rows


def test_distributed_round_trip_with_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else f"n{i}",
          None if i % 7 == 0 else i * 0.5, i % 2 == 0)
         for i in range(200)],
        SCHEMA,
    ).repartition(4)
    out = str(tmp_path / "records.avro")
    AC.write_avro(df, out, codec="deflate")
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(parts) == 4  # one container per partition
    back = AC.read_avro(spark, out)
    assert back.schema == SCHEMA
    got = {(r.id, r.name, r.score, r.ok) for r in back.collect()}
    want = {(r.id, r.name, r.score, r.ok) for r in df.collect()}
    assert got == want
    # schema mismatch fails loudly
    other = T.StructType([T.StructField("id", T.LongType(), False)])
    with pytest.raises(Exception, match="schema mismatch"):
        AC.read_avro(spark, out, expected=other).collect()
