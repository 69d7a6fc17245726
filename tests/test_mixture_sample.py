"""T25 mixture sampling: exact apportioned per-stratum counts,
determinism, exhausted-stratum behavior, and consistency with the
already-oracled balanced_sample_df hash order."""

import math

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.plans.pipeline_ops import (
    balanced_sample_df,
    mixture_sample_df,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "lang", "n_chars").persist())


def _lr_quota(weights, total):
    wsum = sum(weights.values())
    fracs = {s: w / wsum * total for s, w in weights.items()}
    quota = {s: math.floor(f) for s, f in fracs.items()}
    left = total - sum(quota.values())
    for s in sorted(fracs, key=lambda s: (-(fracs[s] - quota[s]), s))[:left]:
        quota[s] += 1
    return quota


def test_exact_apportioned_counts(spark, docs):
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    weights = {langs[0]: 0.6, langs[1]: 0.3, langs[2]: 0.1}
    got = mixture_sample_df(docs, "lang", weights, total=50)
    counts = {r.lang: r.n for r in
              got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == _lr_quota(weights, 50)
    assert sum(counts.values()) == 50


def test_deterministic_and_stratum_restricted(spark, docs):
    weights = {"en": 0.5, "de": 0.5}
    a = {tuple(r) for r in mixture_sample_df(docs, "lang", weights, 40).collect()}
    b = {tuple(r) for r in mixture_sample_df(docs, "lang", weights, 40).collect()}
    assert a == b and a
    assert {r[1] for r in a} <= {"en", "de"}  # absent-weight strata excluded


def test_exhausted_stratum_yields_all_its_rows(spark, docs):
    lang, n = (docs.groupBy("lang").agg(F.count("*").alias("n"))
               .orderBy("n").first())
    got = mixture_sample_df(docs, "lang", {lang: 1.0}, total=n + 100)
    assert got.count() == n  # short, not padded


def test_matches_balanced_sample_per_stratum(spark, docs):
    """Within a stratum, mixture selection at quota q must equal
    balanced_sample at k=q — both rank by the same seeded hash."""
    weights = {"en": 0.7, "fr": 0.3}
    total = 30
    quota = _lr_quota(weights, total)
    mix = mixture_sample_df(docs, "lang", weights, total)
    for lang, q in quota.items():
        want = {r.doc_id for r in
                balanced_sample_df(docs.filter(F.col("lang") == lang),
                                   "lang", k=q).collect()}
        got = {r.doc_id for r in mix.filter(F.col("lang") == lang).collect()}
        assert got == want, lang
