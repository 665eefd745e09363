import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from hyppo_worker_spark.session import get_spark

    return get_spark("tests", master="local[4]", shuffle_partitions=4)


@pytest.fixture()
def storage(tmp_path, spark):
    from hyppo_worker_spark.storage import DataFileHandler, StorageLayout

    return DataFileHandler(spark, StorageLayout(bucket=str(tmp_path)))
