"""Drive __spark_entry__.py exactly as the driver does: fresh process,
import the module, run entry(spark) + every queries() entry vs its
oracle_sql() on DuckDB. This is the repo's end-to-end surface."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb  # noqa: E402

import __spark_entry__ as mod  # noqa: E402
from check import value_hash  # noqa: E402
from hyppo_worker_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("drive_entry")

# 1. smoke: entry()
df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) >= 0

# 2. correctness: queries() vs oracle_sql()
qs, oracles = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(SF_DIR, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

bad = []
for name, fn in qs.items():
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    spark.catalog.clearCache()
    if name not in oracles:
        print(f"  {name}: rows-only, {len(srows)} rows")
        continue
    res = con.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    match = (
        len(srows) == len(orows)
        and sorted(sdf.columns) == sorted(ocols)
        and value_hash(list(sdf.columns), srows) == value_hash(ocols, orows)
    )
    print(f"  {name}: {'MATCH' if match else 'MISMATCH'} ({len(srows)} rows)")
    if not match:
        bad.append(name)

print(f"RESULT: {len(qs) - len(bad)}/{len(qs)} match; failures={bad}")
sys.exit(1 if bad else 0)
