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


@given(
    keys=st.lists(
        st.tuples(st.integers(min_value=0, max_value=400),
                  st.integers(min_value=0, max_value=5)),
        min_size=1, max_size=60, unique=True),
    width_a=st.integers(min_value=1, max_value=7),
    width_b=st.integers(min_value=8, max_value=200),
    start=st.integers(min_value=0, max_value=1000),
)
@settings(**SETTINGS)
def test_global_seq_invariant_to_bucket_width(spark, keys, width_a,
                                              width_b, start):
    """The crawl's frontier overlap (round 5) rests on this: the sequence
    with_global_seq assigns depends only on the total order
    (*bucket_cols, *order_cols), NOT on the bucket granularity — any
    fixed width over the leading key is a monotone coarsening of the
    same order. Two arbitrary widths must agree with each other and
    with a sorted-enumerate oracle."""
    from web_crawler_spark.plans.seq import with_global_seq

    df = spark.createDataFrame(
        [(k, s) for k, s in keys], "fetch_seq long, link_pos long")

    def run(width):
        out = with_global_seq(
            df.withColumn("_fb", (F.col("fetch_seq") / F.lit(width)).cast("long")),
            ["_fb"], ["fetch_seq", "link_pos"], "seq", start=start)
        return {(r.fetch_seq, r.link_pos): r.seq for r in out.collect()}

    got_a, got_b = run(width_a), run(width_b)
    want = {k: start + i for i, k in enumerate(sorted(keys))}
    assert got_a == want
    assert got_b == want
