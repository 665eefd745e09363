"""Format helpers: schema-enforced reads, round-trips, jar gating."""

import pytest
from pyspark.sql import types as T

from hyppo_worker_spark.sources import formats as FMT

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)], SCHEMA
    )


def test_parquet_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "t.parquet")
    FMT.write_parquet(sample, p)
    back = FMT.read_parquet(spark, p, SCHEMA)
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]


def test_parquet_partitioned_write(spark, sample, tmp_path):
    p = str(tmp_path / "part.parquet")
    FMT.write_parquet(sample.fillna({"name": "x"}), p, partition_by=["name"])
    import os

    assert any(d.startswith("name=") for d in os.listdir(p))


def test_csv_round_trip_with_schema(spark, sample, tmp_path):
    p = str(tmp_path / "t.csv")
    sample.write.mode("overwrite").option("header", "true").csv(p)
    back = FMT.read_csv(spark, p, SCHEMA)
    assert back.schema == SCHEMA
    assert back.count() == 3


def test_json_round_trip_with_schema(spark, sample, tmp_path):
    p = str(tmp_path / "t.json")
    sample.write.mode("overwrite").json(p)
    back = FMT.read_json(spark, p, SCHEMA)
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]


def test_binary_files_reader(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"payload-a")
    (tmp_path / "b.txt").write_bytes(b"payload-b")
    df = FMT.read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"payload-a"


def test_avro_gated_when_jar_missing(spark, sample, tmp_path):
    """This container has no spark-avro jar: the avro surface must
    raise FormatUnavailable, not a raw ClassNotFoundException."""
    try:
        FMT.write_avro(sample, str(tmp_path / "t.avro"))
        avro_present = True
    except FMT.FormatUnavailable:
        avro_present = False
    if avro_present:
        back = FMT.read_avro(spark, str(tmp_path / "t.avro"))
        assert back.count() == 3


def test_jdbc_gated_without_driver(spark, sample):
    with pytest.raises(FMT.FormatUnavailable):
        FMT.read_jdbc(spark, "jdbc:postgresql://nohost/db", "t")


def test_orc_round_trip_with_pushdown(spark, sample, tmp_path):
    """ORC is the second columnar format Spark ships natively: round
    trip plus evidence that scan-time filter pushdown reaches the ORC
    reader (PushedFilters in the formatted plan)."""
    p = str(tmp_path / "t.orc")
    FMT.write_orc(sample, p)
    back = FMT.read_orc(spark, p)
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]

    from hyppo_worker_spark.plans.explain import pushed_filters

    pushed = pushed_filters(back.filter("id = 2"))
    assert any("id" in p for p in pushed)


def test_orc_partitioned_write_prunes(spark, sample, tmp_path):
    import os

    p = str(tmp_path / "part.orc")
    FMT.write_orc(sample.fillna({"name": "x"}), p, partition_by=["name"])
    assert any(d.startswith("name=") for d in os.listdir(p))
    back = FMT.read_orc(spark, p).filter("name = 'a'")
    assert back.count() == 1


def test_xml_round_trip_with_schema(spark, sample, tmp_path):
    """Spark 4 ships the xml source in core (probed PRESENT here,
    unlike avro): round trip through write_xml/read_xml with an
    explicit schema and a custom row tag."""
    p = str(tmp_path / "t.xml")
    FMT.write_xml(sample.fillna({"name": "x"}), p, row_tag="doc")
    back = FMT.read_xml(
        spark,
        p,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
            ]
        ),
        row_tag="doc",
    )
    rows = {(r.id, r.name) for r in back.collect()}
    assert {i for i, _ in rows} == {1, 2, 3}
