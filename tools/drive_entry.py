"""Drive __spark_entry__.py exactly as the driver does: fresh process,
import the module, run entry(spark) + every queries() entry vs its
oracle_sql() on DuckDB. This is the repo's end-to-end surface.

``--bare`` runs the same window on a session with NO engine configs
(``SparkSession.builder.master("local[N]")`` and nothing else) — the
regression mode for the round-6 p06 failure class, where a query
silently depended on a ``session.get_spark``-only builder config
(spark.sql.python.filterPushdown.enabled) that the driver harness's
own session doesn't set. Every query must pass bare.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb  # noqa: E402

import __spark_entry__ as mod  # noqa: E402
from check import value_hash  # noqa: E402

args = [a for a in sys.argv[1:] if a != "--bare"]
BARE = "--bare" in sys.argv[1:]
SF_DIR = args[0] if args else "/root/testdata/sf0.01"

if BARE:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("drive_entry_bare")
        .getOrCreate()
    )
    print(f"BARE session: local[{cpus}], no engine configs")
else:
    from hyppo_worker_spark.session import get_spark

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
    try:
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # a bare-session config dependency surfaces here
        print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        bad.append(name)
        continue
    from hyppo_worker_spark.session import clear_cache
    clear_cache(spark, include_rdd_blocks=True)
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
