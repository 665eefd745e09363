"""Property test for spec Schema Resolution: random (writer, reader)
evolution pairs — field reordering, reader-side drops, added fields
with defaults, and the spec's promotions (int→long, int→double,
long→double, string↔bytes) — decoded through
``read_container(reader_schema=...)`` must match a pure-Python
resolution model. Complements test_avro_resolution's hand-built
cases with randomized shape coverage.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from hyppo_worker_spark.sources import avro_container as AC
from hyppo_worker_spark.sources.avro_schema import avro_to_struct

# (writer type, legal reader promotions, value strategy)
_BASE = {
    "int": (
        ["int", "long", "double"],
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
    ),
    "long": (
        ["long", "double"],
        # double-exact range so int→double promotion is lossless
        st.integers(min_value=-(2**50), max_value=2**50),
    ),
    "string": (["string", "bytes"], st.text(max_size=10)),
    "bytes": (
        ["bytes", "string"],
        # ascii-only so bytes→string promotion always decodes
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=10,
        ).map(lambda s: s.encode()),
    ),
}


def _promote(value, wt: str, rt: str):
    if wt == rt:
        return value
    if rt == "double":
        return float(value)
    if rt == "long":
        return value
    if wt == "string" and rt == "bytes":
        return value.encode()
    if wt == "bytes" and rt == "string":
        return value.decode()
    raise AssertionError(f"unexpected promotion {wt}->{rt}")


@st.composite
def _case(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    writer_fields, readers, strats = [], [], []
    for i in range(n):
        wt = draw(st.sampled_from(sorted(_BASE)))
        promos, vals = _BASE[wt]
        writer_fields.append({"name": f"c{i}", "type": wt})
        strats.append((wt, vals))
        action = draw(st.sampled_from(["keep", "promote", "drop"]))
        if action == "drop":
            readers.append(None)
        else:
            rt = draw(st.sampled_from(promos)) if action == "promote" else wt
            readers.append({"name": f"c{i}", "type": rt})
    # at least one reader field must survive
    if all(r is None for r in readers):
        readers[0] = dict(writer_fields[0])
    # reader-only fields, filled from their declared defaults
    added = draw(st.integers(min_value=0, max_value=2))
    defaults = {}
    reader_fields = [r for r in readers if r is not None]
    for j in range(added):
        dv = draw(st.integers(min_value=-99, max_value=99))
        reader_fields.append(
            {"name": f"new{j}", "type": "long", "default": dv}
        )
        defaults[f"new{j}"] = dv
    perm = draw(st.permutations(range(len(reader_fields))))
    reader_fields = [reader_fields[p] for p in perm]

    rows = []
    for _ in range(draw(st.integers(min_value=0, max_value=5))):
        rows.append(
            {f"c{i}": draw(strats[i][1]) for i in range(n)}
        )
    writer = {"type": "record", "name": "r", "fields": writer_fields}
    reader = {"type": "record", "name": "r", "fields": reader_fields}
    return writer, reader, rows, readers, strats, defaults


@settings(max_examples=60, deadline=None)
@given(_case())
def test_random_evolution_matches_model(case):
    writer, reader, rows, readers, strats, defaults = case
    blob = AC.write_container(
        avro_to_struct(json.dumps(writer)),
        rows,
        codec="null",
        block_records=2,
    )
    _, _, got = AC.read_container(blob, reader_schema=json.dumps(reader))

    reader_types = {
        f["name"]: f["type"] for f in reader["fields"]
    }
    expected = []
    for row in rows:
        out = dict(defaults)
        for i, r in enumerate(readers):
            if r is None:
                continue
            wt = strats[i][0]
            out[r["name"]] = _promote(row[r["name"]], wt, reader_types[r["name"]])
        expected.append(out)
    assert got == expected
