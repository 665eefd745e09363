"""A/B: interpreted HOF-fold cosine vs a mapInArrow numpy scorer
(VERDICT r12 item 3 spike).

The engine's dot/norm are sequential left folds (functions/vectors.py)
— CodegenFallback, interpreted per element — because that is DuckDB's
``list_reduce`` evaluation order and keeps every similarity row
bit-exact against the oracle. Round 12 measured the codegen-friendly
unrolled chain 6.9x SLOWER (tools/ab_dot_unroll.py); the remaining
escape is an Arrow/numpy kernel. The standard numpy reductions
(np.dot/einsum) change summation order, but a DIM-LOOP accumulation —
``acc += a[:, j] * b[:, j]`` for j in 0..dim-1, vectorized ACROSS ROWS
— performs, per row, exactly the same left-to-right IEEE adds and
multiplies as the fold, so it is bit-identical AND vectorized.

Measures, at --rows x --dim (default 1M x 64), min-of-3 noop-sink wall:
  A: HOF fold cosine (the shipped form);
  B: mapInArrow numpy cosine, exact dim-loop order (bit-exact check
     against A via IS DISTINCT FROM);
  C: mapInArrow numpy cosine via einsum (order-changing upper bound —
     what exactness costs vs the fastest kernel).

Usage: python tools/ab_arrow_scorer.py [--rows 1000000] [--dim 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hyppo_worker_spark.functions import vectors as V
    from hyppo_worker_spark.session import get_spark

    spark = get_spark("ab_arrow_scorer")
    spark.sparkContext.setLogLevel("ERROR")
    dim = args.dim

    # deterministic pseudo-random arrays (same recipe as ab_dot_unroll)
    base = spark.range(args.rows)
    a = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000)) / 500.0 - 1.0)
            for j in range(dim)
        ]
    )
    b = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(j + dim)), F.lit(1000))
                / 500.0
                - 1.0
            )
            for j in range(dim)
        ]
    )
    df = base.select("id", a.alias("a"), b.alias("b")).localCheckpoint(
        eager=True
    )

    cos_fold = V.dot(F.col("a"), F.col("b")) / (
        V.norm(F.col("a")) * V.norm(F.col("b"))
    )
    frame_a = df.select("id", cos_fold.alias("cos"))

    def np_cos_exact(it):
        import numpy as np

        for batch in it:
            av = batch.column("a")
            bv = batch.column("b")
            n = len(av)
            am = np.asarray(av.flatten()).reshape(n, dim)
            bm = np.asarray(bv.flatten()).reshape(n, dim)
            # exact left-to-right fold order, vectorized across rows
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for j in range(dim):
                dot += am[:, j] * bm[:, j]
                na += am[:, j] * am[:, j]
                nb += bm[:, j] * bm[:, j]
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            import pyarrow as pa

            yield pa.RecordBatch.from_arrays(
                [batch.column("id"), pa.array(cos, type=pa.float64())],
                ["id", "cos"],
            )

    frame_b = df.mapInArrow(np_cos_exact, "id long, cos double")

    def np_cos_fast(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            n = len(batch.column("a"))
            am = np.asarray(batch.column("a").flatten()).reshape(n, dim)
            bm = np.asarray(batch.column("b").flatten()).reshape(n, dim)
            dot = np.einsum("ij,ij->i", am, bm)
            cos = dot / (
                np.sqrt(np.einsum("ij,ij->i", am, am))
                * np.sqrt(np.einsum("ij,ij->i", bm, bm))
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("id"), pa.array(cos, type=pa.float64())],
                ["id", "cos"],
            )

    frame_c = df.mapInArrow(np_cos_fast, "id long, cos double")

    def timed(frame, label):
        best = None
        for _ in range(3):
            t0 = time.time()
            frame.write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.time() - t0)
        print(f"{label}: {best:.3f}s")
        return best

    ta = timed(frame_a, "A fold (shipped)")
    tb = timed(frame_b, "B mapInArrow exact-order")
    tc = timed(frame_c, "C mapInArrow einsum")

    mismatch = (
        frame_a.alias("x")
        .join(frame_b.alias("y"), "id")
        .filter(F.expr("x.cos IS DISTINCT FROM y.cos"))
        .count()
    )
    print(
        f"rows={args.rows} dim={dim}  A={ta:.3f}  B={tb:.3f} "
        f"(speedup {ta / tb:.2f}x, bit-mismatches={mismatch})  "
        f"C={tc:.3f} (speedup {ta / tc:.2f}x, order-changing)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
