"""q72 (mapInPandas chain fold) must equal q67 (recursive CTE) —
the depth-independent scale twin's value pin (VERDICT r8 item 4).

Both run on the same sf0.001 orders and must agree cell-for-cell on
the per-depth histogram. A second case plants a chain that crosses
an Arrow-batch boundary (tiny maxRecordsPerBatch) to prove the
cross-batch carry inside a partition is correct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_q72_equals_q67(spark):
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    reg = load_all()
    got67 = _rows(reg["q67_recursive_chain_fold"].spark_fn(spark, SF_DIR))
    got72 = _rows(reg["q72_chain_fold_scale_twin"].spark_fn(spark, SF_DIR))
    release_persists()
    assert got67 == got72
    assert len(got67) > 3  # real multi-depth histogram, not a stub


@pytest.mark.parametrize("batch_rows", [1, 3])
def test_cross_batch_carry(spark, tmp_path, batch_rows):
    """One 10-order customer folded correctly even when every Arrow
    batch holds 1 or 3 rows — run/depth carry across batches."""
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import scoped_conf

    # orders: one customer, 10 orders of $100k each → resets at every
    # 3rd order (300k cap); plus a 1-order customer as a boundary case
    rows = [
        (i, 7, 100_000.0, f"1998-01-{i + 1:02d}") for i in range(10)
    ] + [(100, 9, 50_000.0, "1998-02-01")]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, d string"
    ).select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.to_date("d").alias("o_orderdate"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    reg = load_all()
    with scoped_conf(
        spark, "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
    ):
        got = _rows(reg["q72_chain_fold_scale_twin"].spark_fn(spark, str(tmp_path)))
    # depth histogram: cust 7 contributes depths 0..9, resets at
    # depths 2,5,8 (run hits 300k); cust 9 contributes depth 0.
    # run_cents at depth d for cust 7: 100k*(d%3 + 1) cents unless
    # reset → 0. depth 0 row also carries cust 9's 50k.
    cents = {d: (0 if d % 3 == 2 else 10_000_000 * (d % 3 + 1)) for d in range(10)}
    expect = []
    for d in range(10):
        n_orders = 2 if d == 0 else 1
        n_cust = 2 if d == 0 else 1
        run = cents[d] + (5_000_000 if d == 0 else 0)
        resets = 1 if d % 3 == 2 else 0
        expect.append((d, n_orders, n_cust, run, resets))
    assert got == expect
