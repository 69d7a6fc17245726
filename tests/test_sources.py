"""Custom source surface: the fakeweb Python DataSource (the engine's
pluggable fetch boundary) and the IcebergCatalog config gate."""

import pytest

from web_crawler_spark.sources.fakeweb import FakeWebDataSource
from web_crawler_spark.sources.iceberg import IcebergCatalog


@pytest.fixture(scope="module")
def fakeweb(spark):
    spark.dataSource.register(FakeWebDataSource)
    return spark


def test_fakeweb_rows_and_partitioning(fakeweb):
    df = (fakeweb.read.format("fakeweb")
          .option("n", 500).option("n_hosts", 12).option("parts", 8).load())
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    assert df.select("host").distinct().count() == 12
    assert set(df.columns) == {"url", "host", "image_id", "priority", "row_id"}


def test_fakeweb_deterministic_across_reads(fakeweb):
    opts = dict(n="300", n_hosts="9", parts="4")
    a = fakeweb.read.format("fakeweb").options(**opts).load().orderBy("row_id").collect()
    b = fakeweb.read.format("fakeweb").options(**opts).load().orderBy("row_id").collect()
    assert a == b
    # per-partition reproducibility: a different parts count must yield
    # the same ROWS (sharding is layout, not content)
    c = (fakeweb.read.format("fakeweb").option("n", 300).option("n_hosts", 9)
         .option("parts", 2).load().orderBy("row_id").collect())
    assert a == c


def test_fakeweb_feeds_engine_url_shape(fakeweb):
    """Rows are consumable by the engine's canonicalize → hash → bucket
    pipeline (the S3 fetch-source contract)."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.udfs import canon_udf, host_udf

    df = (fakeweb.read.format("fakeweb").option("n", 200).load()
          .withColumn("canon_url", canon_udf("url"))
          .withColumn("h2", host_udf("canon_url"))
          .withColumn("url_hash", F.xxhash64("canon_url")))
    bad = df.filter((F.col("h2") != F.col("host")) | F.col("url_hash").isNull()).count()
    assert bad == 0


def test_iceberg_catalog_gated_without_jar(spark):
    with pytest.raises(RuntimeError, match="spark-submit --packages"):
        IcebergCatalog(spark, "wcs.crawl")
