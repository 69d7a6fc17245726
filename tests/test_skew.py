"""Salted host-hash bucketing must defeat hot-domain skew (north_rule):
on Zipf(1.1) hosts the salted bucket layout stays balanced while the
unsalted layout concentrates on the hot host's bucket."""

import numpy as np
from pyspark.sql import functions as F

from web_crawler_spark.config import CrawlConfig


def test_salting_flattens_zipf_hosts(spark):
    cfg = CrawlConfig(n_buckets=32, n_salts=128)  # same 4× fan-out as defaults
    rng = np.random.default_rng(5)
    n_hosts, n = 40, 20000
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()
    hosts = rng.choice(n_hosts, size=n, p=p)
    df = spark.createDataFrame(
        [(f"h{h}.example", f"http://h{h}.example/p/{i}") for i, h in enumerate(hosts)],
        "host string, url string",
    )
    salt = F.pmod(F.xxhash64("url"), F.lit(cfg.n_salts))
    salted = df.select(F.pmod(F.xxhash64("host", salt), F.lit(cfg.n_buckets)).alias("b"))
    unsalted = df.select(F.pmod(F.xxhash64("host"), F.lit(cfg.n_buckets)).alias("b"))

    def ratio(d):
        counts = [r.c for r in d.groupBy("b").agg(F.count("*").alias("c")).collect()]
        return max(counts) / (sum(counts) / cfg.n_buckets)

    r_salted, r_unsalted = ratio(salted), ratio(unsalted)
    assert r_salted <= 2.0, f"salted skew {r_salted:.2f} > 2"
    assert r_unsalted > 4.0, f"unsalted skew unexpectedly low ({r_unsalted:.2f}) — test not probative"
