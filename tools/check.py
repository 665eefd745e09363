"""Local correctness checker mimicking the driver's oracle compare.

Runs each registered query's Spark implementation and its DuckDB
oracle SQL on the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash (values stringified
with float rounding already applied inside the queries).

Usage:
    python tools/check.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument(
        "--bare",
        action="store_true",
        help="run on a SparkSession with NO engine configs (the driver-"
        "harness environment) — catches session.py-only config "
        "dependencies in queries the 50-entry window doesn't cover",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import get_spark

    registry = load_all()
    names = args.names or list(registry)
    if args.bare:
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("check_bare")
            .getOrCreate()
        )
        print(f"BARE session: local[{cpus}], no engine configs")
    else:
        spark = get_spark("check")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"?? {name}: not registered")
            failures.append(name)
            continue
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, args.sf_dir)
            scols = list(sdf.columns)
            # The driver's canonicalizer sorts the pandas frame by every
            # column — array/map/struct cells are unhashable there and
            # crash the compare (q27, round 1). Reject them at source.
            complex_cols = [
                f.name for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(f"XX {name}: complex output columns {complex_cols} "
                      "(driver canonicalizer cannot sort/hash these — "
                      "flatten to scalars or strings)")
                failures.append(name)
                continue
            srows = [tuple(r) for r in sdf.collect()]
            # full cache hygiene between queries: tracked persists
            # released, SQL cache cleared, localCheckpoint RDD blocks
            # dropped — then ASSERT nothing stayed cached (VERDICT r7
            # item 5: a long-lived session must not accumulate
            # partitions toward LRU eviction)
            from hyppo_worker_spark.session import clear_cache
            clear_cache(spark, include_rdd_blocks=True)
            n_cached = len(
                spark.sparkContext._jsc.getPersistentRDDs()
            )
            if n_cached:
                print(f"XX {name}: {n_cached} RDDs still cached after "
                      "clear_cache — persist/localCheckpoint leak")
                failures.append(name)
                continue
        except Exception as e:
            print(f"!! {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"!! {name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        problems = []
        # The driver compares value representations across engines;
        # DuckDB types with no Spark analog (HUGEINT from sum(int),
        # DECIMAL from literal arithmetic) render differently in its
        # canonicalizer even when values are numerically equal. The
        # local fetchall() path masks that, so flag declared types
        # directly (round-1 root cause of 6 red rows).
        bad_types = [
            f"{c}:{t}" for c, t in zip(ocols, otypes)
            if "HUGEINT" in t or t.startswith("DECIMAL")
        ]
        if bad_types:
            problems.append(
                f"oracle non-portable types {bad_types} (cast to BIGINT/DOUBLE)"
            )
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
                if args.show_diff:
                    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                    sset = {tuple(normalize_cell(r[i]) for i in order_s) for r in srows}
                    oset = {tuple(normalize_cell(r[i]) for i in order_o) for r in orows}
                    for x in sorted(sset - oset)[:5]:
                        print(f"   spark-only: {x}")
                    for x in sorted(oset - sset)[:5]:
                        print(f"   oracle-only: {x}")
        if problems:
            print(f"XX {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures.append(name)
        else:
            print(f"OK {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
