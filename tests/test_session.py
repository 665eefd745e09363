"""Session helpers: scoped_conf must restore the previous value on
both the normal and the exception path — a leaked conf is the inverse
of the p06 failure class (queries must neither depend on ambient
session configs nor mutate them for later queries)."""

import pytest

from hyppo_worker_spark.session import scoped_conf


def test_scoped_conf_sets_and_restores(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with scoped_conf(spark, key, "7"):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == before


def test_scoped_conf_restores_on_exception(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, key, "9"):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_scoped_conf_restores_unset_key(spark):
    """A key that was never set must end the block UNSET again (not
    pinned to some readback value): conf.get raises for defaultless
    keys, and always re-setting in finally would leak the scoped
    value — ADVICE r7 item."""
    key = "spark.hyppo.test.neverSetKey"
    assert spark.conf.get(key, None) is None
    with scoped_conf(spark, key, "x"):
        assert spark.conf.get(key) == "x"
    assert spark.conf.get(key, None) is None
