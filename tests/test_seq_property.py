"""Property tests (hypothesis, derandomized) for the two-phase sequence
primitives and the operators built on them: prefix sums match numpy on
arbitrary value/bucket layouts, packing matches the sequential oracle on
arbitrary token-count streams, apportionment is exact for arbitrary
weights. Example counts stay small — each example is a Spark job."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from web_crawler_spark.plans.pipeline_ops import pack_sequences_df
from web_crawler_spark.plans.seq import with_global_prefix_sum

SETTINGS = dict(max_examples=12, derandomize=True, deadline=None)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=500),
                  min_size=1, max_size=60),
    bucket_size=st.integers(min_value=1, max_value=70),
    start=st.integers(min_value=0, max_value=1000),
)
@settings(**SETTINGS)
def test_prefix_sum_matches_cumsum(spark, vals, bucket_size, start):
    df = spark.createDataFrame(
        [(i, v, i // bucket_size) for i, v in enumerate(vals)],
        "id long, v long, b long")
    got = with_global_prefix_sum(df, ["b"], ["id"], "v", "ps", start=start)
    rows = {r.id: r.ps for r in got.collect()}
    run = start
    for i, v in enumerate(vals):
        assert rows[i] == run
        run += v


@given(
    toks=st.lists(st.integers(min_value=0, max_value=40),
                  min_size=1, max_size=40),
    ctx=st.integers(min_value=1, max_value=17),
)
@settings(**SETTINGS)
def test_packing_matches_sequential_oracle(spark, toks, ctx):
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tok long")
    got = sorted(tuple(r) for r in
                 pack_sequences_df(docs, ctx, bucket_size=5,
                                   tok_col="n_tok").collect())
    want, cum = [], 0
    for i, n in enumerate(toks):
        if n == 0:
            continue
        off = 0
        while off < n:
            b = (cum + off) // ctx
            take = min((b + 1) * ctx - (cum + off), n - off)
            want.append((i, n, b, off, take))
            off += take
        cum += n
    assert got == sorted(want)


@given(
    weights=st.dictionaries(
        st.sampled_from(["en", "de", "fr", "es", "zh", "ru"]),
        st.floats(min_value=0.01, max_value=10, allow_nan=False),
        min_size=1, max_size=6),
    total=st.integers(min_value=0, max_value=500),
)
@settings(max_examples=100, derandomize=True, deadline=None)
def test_apportionment_exact_and_proportional(weights, total):
    # pure-python mirror of mixture_sample_df's quota computation
    wsum = float(sum(weights.values()))
    fracs = {s: w / wsum * total for s, w in weights.items()}
    quota = {s: int(f) for s, f in fracs.items()}
    left = total - sum(quota.values())
    for s in sorted(fracs, key=lambda s: (-(fracs[s] - quota[s]), s))[:left]:
        quota[s] += 1
    assert sum(quota.values()) == total
    for s, f in fracs.items():
        assert math.floor(f) <= quota[s] <= math.ceil(f)
