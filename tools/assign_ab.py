"""A/B the vector->centroid assignment forms at configurable row
counts: the broadcast-join + row_number window (the form the repo
ships) vs the packed in-row literal argmax that round 12 prototyped
and REVERTED. Noop-sink timed (guide §1.4), deterministic synthetic
vectors.

History: the in-row form removed the assignment exchange+window from
every plan and measured at parity HERE (isolated, noop sink), but the
clean per-row end-to-end A/B (fresh process per row per tree,
bench.py methodology) showed it 1.2-1.9x SLOWER across the registry's
assignment-bound rows at sf0.1, so it was reverted; this harness keeps
a self-contained copy of the rejected form so the negative result
stays reproducible (OPTIMIZATION_r12.md item 1).

Every rep uses a FRESH centroid set (different values), because that
is what real usage does (each Lloyd round / each trained query embeds
new centroid values) — same-values reps hit the plan/codegen cache
and overstate literal-based forms by 2-4x (measured: a per-value
literal tree at 2k rows costs 0.27s warm-cached but 3.9s median with
16s spikes when values change per action; the packed ArrayType
literal keeps generated code stable and is immune).

Usage: python tools/assign_ab.py [--rows 200000] [--k 16] [--dim 64]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hyppo_worker_spark.functions import vectors as V
    from hyppo_worker_spark.session import get_spark

    def rowwise_assign(df, cents, sim, cent_cols=("cent_id", "cent", "cent_norm")):
        """Self-contained copy of the REJECTED packed in-row argmax
        (formerly similarity.rowwise_assign, probes=1 path): the
        centroid table collected and embedded as one ArrayType literal
        per column; each row picks argmax(sim) via array_max over
        (sim, -cent_id) structs."""
        id_col = cent_cols[0]
        proj = cents.select(*cent_cols)
        dtypes = dict(proj.dtypes)
        rows = sorted(proj.collect(), key=lambda r: r[id_col])
        packed = {}
        for c in cent_cols:
            vals = [r[c] for r in rows]
            if isinstance(vals[0], (list, tuple)):
                packed[c] = F.lit(
                    [[float(x) for x in v] for v in vals]
                ).cast(f"array<{dtypes[c]}>")
            else:
                packed[c] = F.lit(list(vals)).cast(f"array<{dtypes[c]}>")
        k = len(rows)

        def cstruct(i):
            return F.struct(
                *[F.element_at(packed[c], i).alias(c) for c in cent_cols]
            )

        scored = F.transform(
            F.sequence(F.lit(1), F.lit(int(k))),
            lambda i: F.struct(
                sim(cstruct(i)).alias("__o"),
                (-F.element_at(packed[id_col], i)).alias("__nc"),
            ),
        )
        return df.withColumn("cell", -F.array_max(scored)["__nc"])

    spark = get_spark("assign_ab")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic vectors: component j of row i =
    # ((i*31 + j*17) % 97) / 97 - 0.5  (integer arithmetic, no rand)
    vecs = (
        spark.range(args.rows)
        .select(
            F.col("id").alias("__id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(args.dim - 1)),
                lambda j: ((F.col("id") * 31 + j * 17) % 97)
                .cast("double")
                / 97.0
                - 0.5,
            ).alias("__v"),
        )
        .withColumn("__vnorm", V.norm(F.col("__v")))
        .localCheckpoint(eager=True)
    )

    def make_cents(seed: int):
        return (
            spark.range(args.k)
            .select(
                F.col("id").alias("cent_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(args.dim - 1)),
                    lambda j: ((F.col("id") * 13 + j * 7 + seed) % 89)
                    .cast("double")
                    / 89.0
                    - 0.5,
                ).alias("cent"),
            )
            .withColumn("cent_norm", V.norm(F.col("cent")))
            .localCheckpoint(eager=True)
        )

    def old_form(cents):
        scored = vecs.join(F.broadcast(cents)).withColumn(
            "__sim",
            V.dot(F.col("__v"), F.col("cent"))
            / (F.col("__vnorm") * F.col("cent_norm")),
        )
        w = W.partitionBy("__id").orderBy(F.col("__sim").desc(), "cent_id")
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__id", F.col("cent_id").alias("cell"))
        )

    def new_form(cents):
        return rowwise_assign(
            vecs,
            cents,
            lambda c: V.dot(F.col("__v"), c["cent"])
            / (F.col("__vnorm") * c["cent_norm"]),
        ).select("__id", "cell")

    for name, fn in (("old join+window", old_form), ("new packed in-row", new_form)):
        fn(make_cents(0)).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for rep in range(args.reps):
            cents = make_cents(100 * (rep + 1))  # FRESH values per rep
            spark.sparkContext.setJobDescription(f"assign_ab: {name}")
            t0 = time.time()
            fn(cents).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(
            f"{name}: median {statistics.median(ts):.2f}s "
            f"{['%.2f' % t for t in ts]} "
            f"(rows={args.rows}, k={args.k}, dim={args.dim}, fresh values)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
