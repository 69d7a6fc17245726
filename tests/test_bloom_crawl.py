"""Bloom-prefilter routing must be invisible in results (SURVEY.md §4.3:
the sketch prunes, never decides) and actually prune the anti-join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.core import bloom
from web_crawler_spark.plans.crawl import CrawlEngine


def test_bloom_zero_false_negatives_and_bounded_fpr(spark):
    members = spark.range(0, 5000).select(F.xxhash64("id").alias("url_hash"))
    sketch = bloom.build_sketch(members, m_bits=1 << 16)
    maybe = bloom.contains_udf(spark, sketch, m_bits=1 << 16)
    # every member must hit (zero false negatives — exactness backbone)
    hits = members.withColumn("m", maybe("url_hash")).filter("NOT m").count()
    assert hits == 0
    # non-members: FPR bounded (~(bits_set/m)^k, well under 50% here)
    others = spark.range(10**6, 10**6 + 5000).select(F.xxhash64("id").alias("url_hash"))
    fp = others.withColumn("m", maybe("url_hash")).filter("m").count()
    assert fp / 5000 < 0.2


def test_bloom_merge_is_union(spark):
    a = spark.range(0, 1000).select(F.xxhash64("id").alias("url_hash"))
    b = spark.range(1000, 2000).select(F.xxhash64("id").alias("url_hash"))
    both = spark.range(0, 2000).select(F.xxhash64("id").alias("url_hash"))
    merged = bloom.merge(bloom.build_sketch(a, 1 << 16), bloom.build_sketch(b, 1 << 16))
    assert np.array_equal(merged, bloom.build_sketch(both, 1 << 16))


def test_crawl_identical_with_and_without_bloom(spark, fix_dir, tmp_path_factory):
    logs = {}
    for flag in (False, True):
        run = str(tmp_path_factory.mktemp(f"bloomrun{flag}"))
        cfg = CrawlConfig(per_host_k=2, max_rounds=4, bloom_prefilter=flag,
                          bloom_bits=1 << 16)
        eng = CrawlEngine(spark, fix_dir, run, cfg)
        eng.run()
        logs[flag] = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
        logs[(flag, "seen")] = {r.canon_url for r in eng.cat.read("seen").collect()}
    assert logs[True].equals(logs[False])
    assert logs[(True, "seen")] == logs[(False, "seen")]
