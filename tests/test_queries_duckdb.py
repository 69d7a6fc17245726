"""Per-operator DuckDB parity at sf0.001 — a fast in-repo mirror of the
driver's correctness gate (full sweep: tools/check_queries.py)."""

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_queries import compare

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# representative slice across operator families (full set runs in the
# driver and in tools/check_queries.py at sf0.01)
SAMPLE = [
    "pricing_summary", "fetch_join", "asof_join", "topk_per_group",
    "session_window", "metrics_rollup", "distinct_count", "pivot",
    "ngram_jaccard", "embedding_cosine_topk", "running_sum", "dedup_exact",
    "sample_quota",
    "dedup_embedding_cosine", "percentile_agg", "string_agg",
    "set_ops", "anti_join", "corpus_clean", "embedding_norm",
    "range_join", "global_order", "text_quality", "token_count",
    "string_functions", "datetime_functions", "rank_functions", "cube_agg",
]

# boundary-sensitive queries ALSO run at the driver's sf0.01 — sf0.001
# parity missed the corpus_clean dtype split in round 2 (the failure
# mode only bites at the driver's scale/precision)
SF01 = "/root/testdata/sf0.01"
BOUNDARY_01 = ["corpus_clean", "percentile_agg", "set_ops", "anti_join",
               "dedup_embedding_cosine"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    spdf = E.queries()[name](spark, SF).toPandas()
    dkdf = duck.sql(E.oracle_sql()[name]).df()
    problems = compare(spdf, dkdf, name)
    assert not problems, problems


@pytest.mark.parametrize("name", BOUNDARY_01)
def test_query_matches_oracle_sf01(spark, duck01, name):
    spdf = E.queries()[name](spark, SF01).toPandas()
    dkdf = duck01.sql(E.oracle_sql()[name]).df()
    problems = compare(spdf, dkdf, name)
    assert not problems, problems
    assert len(spdf) > 0, f"{name} must be non-vacuous at sf0.01"


def test_ngram_hybrid_branches_agree(spark):
    """The df_split knob routes shingles between row-local pair
    expansion and the distributed self-join — every split must produce
    the identical exact pair set."""
    from web_crawler_spark.plans.queries import q_ngram_jaccard

    base = {tuple(r) for r in q_ngram_jaccard(spark, SF).collect()}
    hot_forced = {tuple(r) for r in q_ngram_jaccard(spark, SF, df_split=3).collect()}
    all_low = {tuple(r) for r in q_ngram_jaccard(spark, SF, df_split=10**9).collect()}
    assert base == hot_forced == all_low
    assert base  # non-vacuous


def test_quality_classifier_exact_vs_python(spark):
    """T27: third independent implementation — plain Python dict lookup
    over every doc must reproduce clf_score EXACTLY (weights are
    multiples of 1/64 and the score is a pure sum, so no float
    tolerance is needed or used)."""
    import pyarrow.parquet as pq

    from web_crawler_spark.plans.queries import CLF_INTERCEPT, CLF_WEIGHTS, q_quality_classifier

    w = dict(CLF_WEIGHTS)
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    expected = {
        int(r.doc_id): sum(w.get(t, 0.0) for t in r.text.lower().split(" ")) + CLF_INTERCEPT
        for r in docs.itertuples()
    }
    got = q_quality_classifier(spark, SF).toPandas()
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert expected[int(r.doc_id)] == r.clf_score, r.doc_id
        assert (r.clf_score > 0) == r.clf_keep


def test_registry_fits_driver_budget():
    """The driver records at most 50 CORRECTNESS rows in registry order
    — a 51st key would get zero graded evidence. Guard the budget."""
    qs = E.queries()
    assert len(qs) <= 50, f"{len(qs)} keys registered; driver budget is 50"
    assert set(E.oracle_sql()) <= set(qs)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_rows_only_queries_run(spark):
    for name in ["dedup_minhash_lsh", "dedup_simhash", "ann_lsh", "ann_ivf",
                 "lang_id", "bloom_prefilter", "image_pipeline", "multimodal_av"]:
        df = E.queries()[name](spark, SF)
        assert df.count() >= 0, name


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=2 of 8 cells must recover most true top-3
    neighbors (recall is the operator's quality contract)."""
    from pyspark.sql import functions as F

    ivf = E.queries()["ann_ivf"](spark, SF).select("q_id", "c_id")
    brute = (
        E.queries()["embedding_cosine_topk"](spark, SF)
        .filter(F.col("rk") <= 3).select("q_id", "c_id")
    )
    inter = brute.intersect(ivf).count()
    assert inter / brute.count() >= 0.5


def test_multimodal_av_deterministic(spark):
    a = E.queries()["multimodal_av"](spark, SF).orderBy("media_id").collect()
    b = E.queries()["multimodal_av"](spark, SF).orderBy("media_id").collect()
    assert a == b
    kinds = {r.kind for r in a}
    assert kinds == {"audio", "video"} and all(r.sampled_frames <= 8 for r in a)
