"""Property test for the round-8 declared-schema-preserving Avro
writer: random record schemas mixing enum / fixed / fixed-decimal /
long / string fields — in nullable unions of BOTH branch orders —
must (1) round-trip values exactly through
``write_container(declared_schema=...)`` + ``read_container`` and
(2) embed the declared schema VERBATIM in the container header, so
the reference's MD5 fingerprint identity
(``IntegrationSchema.scala:25-28`` behavior) survives the trip.
Complements the hand-assembled goldens (exact bytes for known
fixtures) with randomized shape coverage.
"""

from __future__ import annotations

import decimal
import json

from hypothesis import given, settings, strategies as st

from hyppo_worker_spark.sources import avro_container as AC
from hyppo_worker_spark.sources.avro_schema import avro_to_struct

_names = st.sampled_from(["ALPHA", "BETA", "GAMMA", "DELTA", "EPS"])


@st.composite
def _field(draw, i: int):
    kind = draw(st.sampled_from(["enum", "fixed", "fixdec", "long", "string"]))
    if kind == "enum":
        syms = draw(
            st.lists(_names, min_size=2, max_size=5, unique=True)
        )
        ftype: object = {"type": "enum", "name": f"E{i}", "symbols": syms}
        vals = st.sampled_from(syms)
    elif kind == "fixed":
        size = draw(st.integers(min_value=1, max_value=8))
        ftype = {"type": "fixed", "name": f"F{i}", "size": size}
        vals = st.binary(min_size=size, max_size=size)
    elif kind == "fixdec":
        size = draw(st.integers(min_value=2, max_value=6))
        scale = draw(st.integers(min_value=0, max_value=3))
        # N signed bytes hold |unscaled| < 2^(8N-1); keep well inside
        bound = 2 ** (8 * size - 2)
        ftype = {
            "type": "fixed", "name": f"D{i}", "size": size,
            "logicalType": "decimal",
            "precision": len(str(bound)), "scale": scale,
        }
        vals = st.integers(min_value=-bound, max_value=bound).map(
            lambda u, s=scale: decimal.Decimal(u).scaleb(-s)
        )
    elif kind == "long":
        ftype = "long"
        vals = st.integers(min_value=-(2**62), max_value=2**62)
    else:
        ftype = "string"
        vals = st.text(max_size=12)
    nullable = draw(st.sampled_from([None, "null-first", "null-last"]))
    if nullable == "null-first":
        ftype = ["null", ftype]
        vals = st.none() | vals
    elif nullable == "null-last":
        ftype = [ftype, "null"]
        vals = st.none() | vals
    return {"name": f"c{i}", "type": ftype}, vals


@st.composite
def _schema_and_rows(draw):
    n_fields = draw(st.integers(min_value=1, max_value=4))
    fields, val_strats = [], []
    for i in range(n_fields):
        f, vals = draw(_field(i))
        fields.append(f)
        val_strats.append(vals)
    schema = {"type": "record", "name": "r", "fields": fields}
    n_rows = draw(st.integers(min_value=0, max_value=6))
    rows = [
        {f["name"]: draw(v) for f, v in zip(fields, val_strats)}
        for _ in range(n_rows)
    ]
    codec = draw(st.sampled_from(["null", "deflate"]))
    return schema, rows, codec


def _header_schema(blob: bytes) -> str:
    buf = memoryview(blob)
    pos, schema = 4, ""
    while True:
        n, pos = AC.zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = AC.zigzag_decode(buf, pos)
        for _ in range(n):
            kl, pos = AC.zigzag_decode(buf, pos)
            key = bytes(buf[pos : pos + kl]).decode()
            pos += kl
            vl, pos = AC.zigzag_decode(buf, pos)
            if key == "avro.schema":
                schema = bytes(buf[pos : pos + vl]).decode()
            pos += vl
    return schema


@settings(max_examples=60, deadline=None)
@given(_schema_and_rows())
def test_declared_schema_round_trip_and_fingerprint(case):
    schema, rows, codec = case
    declared = json.dumps(schema)
    struct = avro_to_struct(declared)
    blob = AC.write_container(
        struct, rows, codec=codec, declared_schema=declared, block_records=2
    )
    # fingerprint identity: the header embeds the declared JSON verbatim
    assert _header_schema(blob) == declared
    got_struct, got_codec, got_rows = AC.read_container(blob)
    assert got_codec == codec
    assert got_struct == struct
    assert got_rows == rows
