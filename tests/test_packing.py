"""T24 sequence packing: pack_sequences_df vs a sequential numpy oracle,
plus the packing invariants (exact-ctx bins, no token lost/duplicated)
and the with_global_prefix_sum primitive it rides on."""

import re

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.plans.pipeline_ops import pack_sequences_df
from web_crawler_spark.plans.seq import with_global_prefix_sum

SF = "/root/testdata/sf0.001"
CTX = 64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _oracle(pdf, ctx):
    """Sequential reference: concatenate in doc_id order, split every
    ctx tokens, record per-doc segments."""
    segs, cum = [], 0
    for r in pdf.sort_values("doc_id").itertuples():
        n = len(re.findall(r"\S+", r.text))
        if n == 0:
            continue
        off = 0
        while off < n:
            bin_id = (cum + off) // ctx
            take = min((bin_id + 1) * ctx - (cum + off), n - off)
            segs.append((r.doc_id, n, bin_id, off, take))
            off += take
        cum += n
    return segs


def test_matches_sequential_oracle(spark, docs):
    got = sorted(
        tuple(r) for r in pack_sequences_df(docs, CTX, bucket_size=100).collect()
    )
    want = sorted(_oracle(docs.toPandas(), CTX))
    assert got == want


def test_bin_invariants(spark, docs):
    segs = pack_sequences_df(docs, CTX).persist()
    per_bin = segs.groupBy("bin_id").agg(F.sum("seg_len").alias("n")).collect()
    total = sum(r.n for r in per_bin)
    assert total == sum(r.n_tok for r in
                        segs.select("doc_id", "n_tok").distinct().collect())
    last = max(r.bin_id for r in per_bin)
    assert {r.bin_id for r in per_bin} == set(range(last + 1))  # dense bins
    for r in per_bin:
        assert r.n == CTX or (r.bin_id == last and 0 < r.n <= CTX)
    # per-doc segments are contiguous and cover the doc exactly
    per_doc = segs.groupBy("doc_id", "n_tok").agg(
        F.sum("seg_len").alias("s"), F.min("seg_start").alias("m")).collect()
    assert all(r.s == r.n_tok and r.m == 0 for r in per_doc)
    segs.unpersist()


def test_bucket_size_invariance(spark, docs):
    a = {tuple(r) for r in pack_sequences_df(docs, CTX, bucket_size=7).collect()}
    b = {tuple(r) for r in pack_sequences_df(docs, CTX, bucket_size=10**9).collect()}
    assert a == b


def test_prefix_sum_primitive(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("v"),
        (F.col("id") / 50).cast("long").alias("b"))
    got = with_global_prefix_sum(df, ["b"], ["id"], "v", "ps", start=5)
    rows = sorted((r.id, r.v, r.ps) for r in got.collect())
    run = 5
    for i, v, ps in rows:
        assert ps == run, (i, ps, run)
        run += v
