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


def test_crawl_identical_across_sketch_backends(spark, fix_dir, tmp_path_factory):
    """Off / Bloom / cuckoo prefilters must be result-invisible (the
    sketch prunes, never decides)."""
    logs = {}
    variants = {
        "off": dict(bloom_prefilter=False),
        "bloom": dict(bloom_prefilter=True, bloom_bits=1 << 16),
        "cuckoo": dict(bloom_prefilter=True, seen_sketch="cuckoo",
                       cuckoo_buckets=1 << 10),
    }
    for name, kw in variants.items():
        run = str(tmp_path_factory.mktemp(f"sketchrun_{name}"))
        eng = CrawlEngine(spark, fix_dir, run,
                          CrawlConfig(per_host_k=2, max_rounds=4, **kw))
        eng.run()
        logs[name] = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
        logs[(name, "seen")] = {r.canon_url for r in eng.cat.read("seen").collect()}
    assert logs["bloom"].equals(logs["off"])
    assert logs["cuckoo"].equals(logs["off"])
    assert logs[("bloom", "seen")] == logs[("off", "seen")]
    assert logs[("cuckoo", "seen")] == logs[("off", "seen")]


def test_cuckoo_overflow_degrades_safely(spark):
    """A saturated cuckoo must answer all-True (no pruning), never
    produce a false negative."""
    import numpy as np
    from pyspark.sql import functions as F

    from web_crawler_spark.core import cuckoo as ck

    tiny = ck.CuckooFilter(n_buckets=8)           # 32 slots
    keys = np.arange(200, dtype=np.int64) * 7919
    tiny.insert(keys)                             # forced overflow
    assert tiny.overflowed
    assert tiny.contains(keys).all()
    rt = ck.CuckooFilter.from_bytes(tiny.to_bytes(), 8)
    assert rt.overflowed and rt.contains(np.array([123456789], np.int64)).all()
