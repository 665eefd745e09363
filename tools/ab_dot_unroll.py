"""A/B: the HOF sequential-fold dot product (``V.dot``) vs an unrolled
left-deep ``element_at`` Add chain (codegen-friendly, bit-identical
evaluation order).

Motivation (OPTIMIZATION_r12.md "Not yet optimized" item 1): higher-
order functions (``aggregate``/``zip_with``) are CodegenFallback —
every dot product is interpreted — so the obvious per-task-work fix
(guide §1.2 step 2) is to unroll the fold into a left-deep Add chain
over ``element_at`` calls, which whole-stage codegen compiles and which
evaluates in the IDENTICAL IEEE order (``((0.0 + a1*b1) + a2*b2) + …``),
keeping every similarity row bit-exact against the DuckDB oracle.

Measured verdict (2026-08-17, local[8], 1M rows x dim 64, inputs
localCheckpoint'ed, noop-equivalent count sink, min-of-3 interleaved):

    fold (V.dot shape):      1.18 s
    unrolled Add chain:      8.12 s   (6.9x SLOWER)
    bit-difference rows:     0        (IS DISTINCT FROM join)

The unrolled chain loses: 128 ``element_at`` calls per row each pay
per-element null/bounds handling and the giant expression tree is
split across generated methods, while the fold is one tight loop over
the primitive array. The HOF fold therefore STAYS — the deliberate
trade documented since the build rounds is also the faster one.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIM = 64
N = 1_000_000


def dot_fold(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def dot_unrolled(a, b, dim):
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i) * F.element_at(b, i)
    return acc


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-dot-unroll")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(N).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (F.col("id") % (i * 97 + 13)).cast("double") / 7.0 - 3.0,
        ).alias("a"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (F.col("id") % (i * 53 + 29)).cast("double") / 11.0 - 2.0,
        ).alias("b"),
    ).localCheckpoint()

    n_diff = (
        base.select(
            dot_fold(F.col("a"), F.col("b")).alias("df"),
            dot_unrolled(F.col("a"), F.col("b"), DIM).alias("du"),
        )
        .where("df IS DISTINCT FROM du")
        .count()
    )
    print(f"bit-difference rows: {n_diff}")

    fold_df = base.select(dot_fold(F.col("a"), F.col("b")).alias("d"))
    unr_df = base.select(dot_unrolled(F.col("a"), F.col("b"), DIM).alias("d"))

    def timeit(df, label, runs=3):
        best = 9e9
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{label}: min-of-{runs} = {best:.3f}s")
        return best

    timeit(fold_df, "fold   (warm)", 1)
    timeit(unr_df, "unroll (warm)", 1)
    t_fold = timeit(fold_df, "fold  ", 3)
    t_unr = timeit(unr_df, "unroll", 3)
    print(f"fold/unroll = {t_fold / t_unr:.2f}x (>1 means unroll wins)")
    spark.stop()


if __name__ == "__main__":
    main()
