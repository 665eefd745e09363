"""Scale-direction stress harness (VERDICT r3 item 8).

No sf1 testdata exists in the container, so this builds a
DETERMINISTIC 10x amplification of sf0.1's ``documents`` table under
/tmp (doc_id remapped per replica; text suffixed per replica so exact
dedup doesn't collapse the copies), runs the headline training-data
queries at 1x and 10x, and reports per-query:

- wall seconds (first run, cold caches cleared between queries);
- max single-task input bytes and max single-task shuffle-read bytes,
  parsed from the Spark event log — the direct evidence for "does any
  task's working set grow superlinearly with the corpus".

Usage: python tools/stress.py [d06_training_corpus_pipeline t14... ]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
EVENT_DIR = "/tmp/hyppo-stress-events"
DEFAULT_QUERIES = (
    "d06_training_corpus_pipeline",
    "t14_sequence_packing",
    "t13_shard_manifest",
    "t11_decontamination",
)
# --factor N amplifies N x instead (default 10); the corpus lands in
# /tmp/hyppo-stress-x{N} and replica key remapping scales with N.
REPLICAS = 10
X10_DIR = f"/tmp/hyppo-stress-x{REPLICAS}"


def build_x10(spark) -> None:
    """10 deterministic variants of every sf0.1 row, per table the
    stress queries read (documents for the dedup/text paths; orders +
    lineitem for the relational/sketch paths, with consistent
    replicated join keys; embeddings for the ANN paths, perturbed per
    replica so they aren't exact dups)."""
    from pyspark.sql import functions as F

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))

    def _done(table: str) -> bool:
        return os.path.exists(os.path.join(X10_DIR, table, "_SUCCESS"))

    if not _done("documents.parquet"):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        amplified = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") * REPLICAS + F.col("rep"))
            # vary the tail so replicas are near-dups, not exact dups —
            # keeps the LSH verify stage honestly loaded
            .withColumn(
                "text",
                F.concat(
                    F.col("text"), F.lit(" variant "), F.col("rep").cast("string")
                ),
            )
            .drop("rep")
        )
        amplified.write.mode("overwrite").parquet(f"{X10_DIR}/documents.parquet")

    # orders + lineitem replicate with CONSISTENT key remapping, so
    # join fan-outs stay realistic (each replica is its own key space).
    if not _done("orders.parquet"):
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        (
            orders.crossJoin(F.broadcast(reps))
            .withColumn("o_orderkey", F.col("o_orderkey") * REPLICAS + F.col("rep"))
            .withColumn("o_custkey", F.col("o_custkey") * REPLICAS + F.col("rep"))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(f"{X10_DIR}/orders.parquet")
        )
    if not _done("lineitem.parquet"):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        (
            li.crossJoin(F.broadcast(reps))
            .withColumn("l_orderkey", F.col("l_orderkey") * REPLICAS + F.col("rep"))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(f"{X10_DIR}/lineitem.parquet")
        )
    # customer replicates keyed consistently with orders' o_custkey.
    if not _done("customer.parquet"):
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        (
            cust.crossJoin(F.broadcast(reps))
            .withColumn("c_custkey", F.col("c_custkey") * REPLICAS + F.col("rep"))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(f"{X10_DIR}/customer.parquet")
        )
    # events replicate as distinct users with per-replica time jitter
    # (seconds) so intervals/sessions don't collapse to exact copies.
    if not _done("events.parquet"):
        from hyppo_worker_spark.session import load_tables

        ev = load_tables(spark, SF_DIR, ("events",))["events"]
        (
            ev.crossJoin(F.broadcast(reps))
            .withColumn("event_id", F.col("event_id") * REPLICAS + F.col("rep"))
            .withColumn("user_id", F.col("user_id") * REPLICAS + F.col("rep"))
            .withColumn(
                "ts",
                (F.col("ts").cast("timestamp").cast("double") + F.col("rep")).cast(
                    "timestamp"
                ),
            )
            .drop("rep")
            .write.mode("overwrite")
            .parquet(f"{X10_DIR}/events.parquet")
        )
    if not _done("embeddings.parquet"):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        (
            emb.crossJoin(F.broadcast(reps))
            .withColumn("vec_id", F.col("vec_id") * REPLICAS + F.col("rep"))
            .withColumn(
                "embedding",
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: x + F.col("rep").cast("double") / 1000.0,
                ),
            )
            .drop("rep")
            .write.mode("overwrite")
            .parquet(f"{X10_DIR}/embeddings.parquet")
        )
    # dimension tables carry through UNAMPLIFIED — at a real 10x the
    # fact tables grow while region/nation/supplier/part stay
    # dimension-sized; queries joining them (q66, p17, p14…) need
    # them present in the stress dir.
    for dim in ("region", "nation", "supplier", "part"):
        if not _done(f"{dim}.parquet"):
            (
                spark.read.parquet(f"{SF_DIR}/{dim}.parquet")
                .write.mode("overwrite")
                .parquet(f"{X10_DIR}/{dim}.parquet")
            )


def parse_event_log(app_dir: str) -> dict[str, float]:
    """Max per-task input / shuffle-read bytes across the app's tasks."""
    max_input = 0
    max_sread = 0
    max_run = 0
    sum_run = 0
    n_tasks = 0
    paths = [p for p in glob.glob(app_dir) if os.path.isfile(p)]
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                if '"Event":"SparkListenerTaskEnd"' not in line.replace(" ", ""):
                    continue
                ev = json.loads(line)
                tm = ev.get("Task Metrics") or {}
                n_tasks += 1
                max_input = max(
                    max_input, (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
                )
                sr = tm.get("Shuffle Read Metrics") or {}
                max_sread = max(
                    max_sread,
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0),
                )
                rt = tm.get("Executor Run Time", 0)
                max_run = max(max_run, rt)
                sum_run += rt
    return {
        "tasks": n_tasks,
        "max_task_input_mb": round(max_input / 1e6, 2),
        "max_task_shuffle_read_mb": round(max_sread / 1e6, 2),
        # compute-skew evidence byte metrics can miss: a hot join key's
        # pair-emission work shows up as one task's run time dominating
        # the app's total (p18 hot-key stress: 42% of all task-seconds
        # in a single task before the pre-split)
        "max_task_run_s": round(max_run / 1000, 1),
        "sum_task_run_s": round(sum_run / 1000, 1),
    }


def _fresh_session():
    from hyppo_worker_spark.session import get_spark

    spark = get_spark(
        "stress",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            # single plain-JSON file per app (Spark 4 defaults to
            # zstd-compressed rolling dirs, which the parser below
            # would need a zstd codec for)
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    global REPLICAS, X10_DIR
    args = sys.argv[1:]
    if "--factor" in args:
        i = args.index("--factor")
        REPLICAS = int(args[i + 1])
        X10_DIR = f"/tmp/hyppo-stress-x{REPLICAS}"
        del args[i : i + 2]
    names = args or list(DEFAULT_QUERIES)
    os.makedirs(EVENT_DIR, exist_ok=True)

    from hyppo_worker_spark.queries import load_all

    registry = load_all()

    spark = _fresh_session()
    build_x10(spark)
    spark.stop()

    # ONE app per (query, scale): each gets its own event log, so the
    # per-task maxima compare x1 vs x10 for that query alone. The JVM
    # restart cost is irrelevant to the measured walls (timed around
    # the query only, on a warm session).
    results: dict[str, dict] = {}
    # materialize through the noop sink, NOT count(): count() lets
    # Catalyst prune every column, so a map-shaped query (t14's
    # tokenize+pack) collapses to reading parquet row-group counts —
    # 0 input bytes, phantom walls. noop forces all output columns.
    def _run(df) -> None:
        df.write.format("noop").mode("append").save()

    for name in names:
        q = registry[name]
        row: dict[str, dict] = {}
        for label, d in (("x1", SF_DIR), (f"x{REPLICAS}", X10_DIR)):
            spark = _fresh_session()
            _run(q.spark_fn(spark, d))  # warm-up: codegen/JIT
            from hyppo_worker_spark.session import clear_cache

            clear_cache(spark, include_rdd_blocks=True)
            # min-of-2: single-run walls swing with JIT/GC (bench.py
            # rationale); task maxima still cover every run in the app.
            wall = 9e9
            for _ in range(2):
                t0 = time.time()
                _run(q.spark_fn(spark, d))
                wall = min(wall, round(time.time() - t0, 2))
                clear_cache(spark, include_rdd_blocks=True)
            app_id = spark.sparkContext.applicationId
            spark.stop()
            time.sleep(0.5)
            m = parse_event_log(os.path.join(EVENT_DIR, "*" + app_id + "*"))
            row[label] = {"wall_s": wall, **m}
        results[name] = row
        print(f"{name}: {json.dumps(row)}", file=sys.stderr)

    print(json.dumps({"queries": results}))


if __name__ == "__main__":
    main()
