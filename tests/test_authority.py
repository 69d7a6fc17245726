"""priority_mode="authority" (VERDICT r3 #2): round r orders the fetch
batch by host-level PageRank computed from rounds < r. The graded
contract stays oracle parity — the sequential refcrawler implements the
same frozen semantics (quantized ranks, within-host order unchanged) —
plus two guards: the mode actually REORDERS fetches on this fixture
(non-vacuous), and the default BFS mode is untouched."""

import pytest

from oracle.refcrawler import crawl
from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.plans.crawl import CrawlEngine

CFG_AUTH = CrawlConfig(per_host_k=2, max_rounds=4, priority_mode="authority")
LOG_COLS = ["round", "canon_url", "host", "image_id", "priority",
            "discovered_seq", "status"]


@pytest.fixture(scope="module")
def auth_engine_and_oracle(spark, fix_dir, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run_auth"))
    eng = CrawlEngine(spark, fix_dir, run_dir, CFG_AUTH)
    eng.run()
    return eng, crawl(fix_dir, CFG_AUTH)


def test_authority_crawl_order_matches_oracle(auth_engine_and_oracle):
    eng, res = auth_engine_and_oracle
    elog = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert len(elog) == len(res.crawl_log)
    m = elog.merge(res.crawl_log, on="fetch_seq", suffixes=("_e", "_o"))
    for c in LOG_COLS:
        assert (m[f"{c}_e"] == m[f"{c}_o"]).all(), f"column {c} diverges"


def test_authority_seen_set_matches_oracle(auth_engine_and_oracle):
    eng, res = auth_engine_and_oracle
    eseen = {r.canon_url for r in eng.cat.read("seen").collect()}
    assert eseen == res.seen


def test_authority_reorders_but_preserves_politeness(auth_engine_and_oracle, fix_dir):
    """Non-vacuous: the authority interleave must differ from BFS order
    somewhere past round 0 (round 0 has no history, so prefixes agree),
    while the per-host-per-round politeness budget still holds."""
    eng, _ = auth_engine_and_oracle
    bfs = crawl(fix_dir, CrawlConfig(per_host_k=2, max_rounds=4))
    auth_log = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    bfs_log = bfs.crawl_log
    n = min(len(auth_log), len(bfs_log))
    assert list(auth_log["canon_url"][:n]) != list(bfs_log["canon_url"][:n]), \
        "authority mode produced the identical order — vacuous on this fixture"
    per_host_round = auth_log.groupby(["round", "host"]).size()
    assert (per_host_round <= CFG_AUTH.per_host_k).all()


def test_authority_oracle_differs_only_in_order(auth_engine_and_oracle, fix_dir):
    """Authority changes WHEN things are fetched (and what a budget
    would cut) — with no budget, the 4-round fetched URL multiset can
    drift only via politeness-clock interaction, but dedup statuses per
    URL must still be internally consistent (one log row per URL)."""
    eng, _ = auth_engine_and_oracle
    log = eng.cat.read("crawl_log").toPandas()
    assert log["canon_url"].is_unique
    assert log["fetch_seq"].is_unique


def test_authority_budget_truncates_by_rank(spark, fix_dir, tmp_path_factory):
    """Global budget + authority: the cut respects (-rank_q, priority,
    discovered_seq) — engine and oracle agree on the truncated prefix."""
    cfg = CrawlConfig(per_host_k=2, max_rounds=4, global_budget=23,
                      priority_mode="authority")
    run_dir = str(tmp_path_factory.mktemp("run_auth_budget"))
    eng = CrawlEngine(spark, fix_dir, run_dir, cfg)
    eng.run()
    res = crawl(fix_dir, cfg)
    elog = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert len(elog) == len(res.crawl_log) == 23
    m = elog.merge(res.crawl_log, on="fetch_seq", suffixes=("_e", "_o"))
    assert (m["canon_url_e"] == m["canon_url_o"]).all()


def test_authority_resume_identical(spark, fix_dir, tmp_path_factory):
    """Kill-resume under authority mode: rank recomputation from the
    committed log is deterministic, so a resumed run must equal an
    uninterrupted one bit-for-bit."""
    import pandas as pd

    d1 = str(tmp_path_factory.mktemp("run_auth_full"))
    full = CrawlEngine(spark, fix_dir, d1, CFG_AUTH)
    full.run()
    want = full.cat.read("crawl_log").orderBy("fetch_seq").toPandas()

    d2 = str(tmp_path_factory.mktemp("run_auth_resume"))
    part = CrawlEngine(spark, fix_dir, d2,
                       CrawlConfig(per_host_k=2, max_rounds=2,
                                   priority_mode="authority"))
    part.run()
    resumed = CrawlEngine(spark, fix_dir, d2, CFG_AUTH)
    resumed.run()
    got = resumed.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    pd.testing.assert_frame_equal(got, want)


CFG_AUTH_K2 = CrawlConfig(per_host_k=2, max_rounds=4, priority_mode="authority",
                          authority_refresh_every=2)


@pytest.fixture(scope="module")
def auth_k2_engine_and_oracle(spark, fix_dir, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run_auth_k2"))
    eng = CrawlEngine(spark, fix_dir, run_dir, CFG_AUTH_K2)
    eng.run()
    return eng, crawl(fix_dir, CFG_AUTH_K2)


def test_refresh_every_matches_oracle(auth_k2_engine_and_oracle):
    """authority_refresh_every=2: round r uses the rank as of round
    r - (r % 2) — the engine's filtered link graph and the oracle's
    filtered log history must order every round identically."""
    eng, res = auth_k2_engine_and_oracle
    elog = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert len(elog) == len(res.crawl_log)
    m = elog.merge(res.crawl_log, on="fetch_seq", suffixes=("_e", "_o"))
    for c in LOG_COLS:
        assert (m[f"{c}_e"] == m[f"{c}_o"]).all(), f"column {c} diverges"


def test_refresh_every_staleness_is_real(auth_k2_engine_and_oracle, fix_dir):
    """Non-vacuous: with k=2 round 1 runs BFS (rank as of round 0 = no
    history) while k=1 ranks round 1 from round 0's fetches — the two
    configs must diverge somewhere on this fixture."""
    eng, _ = auth_k2_engine_and_oracle
    k1 = crawl(fix_dir, CFG_AUTH)
    k2_log = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    n = min(len(k2_log), len(k1.crawl_log))
    assert list(k2_log["canon_url"][:n]) != list(k1.crawl_log["canon_url"][:n]), \
        "refresh_every=2 produced the identical order to k=1 — vacuous fixture"


def test_refresh_every_resume_identical(spark, fix_dir, tmp_path_factory):
    """Kill-resume under k=2: the rank round is derived from r alone +
    the committed log, so a restarted engine (empty in-memory rank
    cache) must reproduce the uninterrupted run bit-for-bit — including
    a resume INTO a non-refresh round (r=3 uses rank as of round 2)."""
    full_dir = str(tmp_path_factory.mktemp("run_k2_full"))
    CrawlEngine(spark, fix_dir, full_dir, CFG_AUTH_K2).run()
    part_dir = str(tmp_path_factory.mktemp("run_k2_part"))
    CrawlEngine(spark, fix_dir, part_dir,
                CrawlConfig(per_host_k=2, max_rounds=3,
                            priority_mode="authority",
                            authority_refresh_every=2)).run()
    resumed = CrawlEngine(spark, fix_dir, part_dir, CFG_AUTH_K2)
    resumed.run()
    a = CrawlEngine(spark, fix_dir, full_dir, CFG_AUTH_K2) \
        .cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    b = resumed.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert a.equals(b)
