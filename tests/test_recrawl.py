"""Recrawl-window eviction (plans/crawl.evict_cohort): the cuckoo-backed
seen filter forgets a retired cohort without a rebuild, the seen table
compacts, and evicted URLs get RE-fetched deterministically when links
re-discover them."""

import numpy as np
import pytest

from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.plans.crawl import CrawlEngine

CFG = CrawlConfig(per_host_k=2, max_rounds=7, seen_sketch="cuckoo",
                  bloom_prefilter=True)


def _run_with_evict(spark, fix_dir, run_dir):
    eng = CrawlEngine(spark, fix_dir, run_dir, CFG)
    eng.init_state()
    for r in range(3):
        eng.run_round(r)
    stats = eng.evict_cohort(0)
    for r in range(3, CFG.max_rounds):
        eng.run_round(r)
    return eng, stats


@pytest.fixture(scope="module")
def evicted_run(spark, fix_dir, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("recrawl"))
    return _run_with_evict(spark, fix_dir, run_dir)


def test_cohort_leaves_sketch_and_seen(evicted_run):
    eng, stats = evicted_run
    assert stats["evicted"] > 0
    # every cohort fingerprint came OUT of the cuckoo table (no rebuild,
    # no overflow degrade — deletion is the capability Bloom lacks)
    assert stats["sketch_removed"] == stats["evicted"]
    assert not eng._sketch.overflowed


def test_eviction_never_collects_cohort_rows(spark, fix_dir, tmp_path_factory,
                                             monkeypatch):
    """VERDICT r3 #3: the cuckoo eviction path must not pull the cohort's
    url_hashes to the driver — at the 10^10 design point a cohort is
    ~10^8-10^9 hashes (GBs). Only the distributed cohort-sketch build's
    packed per-partition tables may cross (<= n_parts rows). Spy on
    DataFrame.collect during evict_cohort and bound every result."""
    run_dir = str(tmp_path_factory.mktemp("recrawl_nocollect"))
    eng = CrawlEngine(spark, fix_dir, run_dir, CFG)
    eng.init_state()
    for r in range(3):
        eng.run_round(r)
    sizes = []
    # patch the CONCRETE frame class (pyspark 4's classic DataFrame
    # overrides the abstract base's collect, so patching
    # pyspark.sql.DataFrame spies on nothing)
    cls = type(eng.cat.read("seen"))
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    stats = eng.evict_cohort(0)
    monkeypatch.setattr(cls, "collect", orig)
    assert stats["evicted"] > 0
    assert sizes, "expected the sketch-build collect"
    assert max(sizes) <= 16, (
        f"a collect on the eviction path returned {max(sizes)} rows — "
        "cohort-sized data reached the driver")


def test_evicted_urls_are_recrawled(evicted_run):
    eng, _ = evicted_run
    log = eng.cat.read("crawl_log").toPandas()
    per_url = log.groupby("canon_url").size()
    recrawled = per_url[per_url >= 2]
    assert len(recrawled) > 0  # at least one URL fetched twice
    # the refetches are genuine round-0 cohort members, refetched later
    r0 = set(log[log["round"] == 0]["canon_url"])
    assert any(u in r0 for u in recrawled.index)
    for u in recrawled.index:
        rounds = sorted(log[log["canon_url"] == u]["round"].tolist())
        assert rounds[0] <= 2 and rounds[-1] >= 3


def test_recrawl_summary_report(evicted_run):
    from web_crawler_spark.plans import reports

    eng, _ = evicted_run
    rows = reports.recrawl_summary(eng.cat).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_fetches"] >= 2
        assert r["first_round"] < r["last_round"]
        assert len(r["statuses"]) == r["n_fetches"]


def test_recrawl_is_deterministic(spark, fix_dir, tmp_path_factory, evicted_run):
    eng1, _ = evicted_run
    run2 = str(tmp_path_factory.mktemp("recrawl2"))
    eng2, _ = _run_with_evict(spark, fix_dir, run2)
    a = eng1.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    b = eng2.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert a.equals(b)


def test_eviction_survives_crash_before_evict(spark, fix_dir, tmp_path_factory):
    """Crash window: round r commits, process dies BEFORE the due
    eviction runs. On resume, run() must replay the missed eviction
    (last_evicted marker catch-up) so the interrupted run converges to
    the uninterrupted run bit-for-bit."""
    cfg = CrawlConfig(per_host_k=2, max_rounds=6, seen_sketch="cuckoo",
                      bloom_prefilter=True, recrawl_window=3)
    dir_a = str(tmp_path_factory.mktemp("recrawl_uninterrupted"))
    eng_a = CrawlEngine(spark, fix_dir, dir_a, cfg)
    eng_a.run()

    dir_b = str(tmp_path_factory.mktemp("recrawl_crashed"))
    eng_b = CrawlEngine(spark, fix_dir, dir_b, cfg)
    eng_b.init_state()
    for r in range(4):
        eng_b.run_round(r)  # commit(3) lands; the due evict_cohort(0) does NOT
    assert int(eng_b.cat.counters().get("last_evicted", -1)) == -1
    eng_b2 = CrawlEngine(spark, fix_dir, dir_b, cfg)  # "restart"
    eng_b2.run()
    assert int(eng_b2.cat.counters().get("last_evicted", -1)) >= 0

    a = eng_a.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    b = eng_b2.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert a.equals(b)
    sa = sorted(r["canon_url"] for r in eng_a.cat.read("seen").collect())
    sb = sorted(r["canon_url"] for r in eng_b2.cat.read("seen").collect())
    assert sa == sb


def test_run_loop_wires_recrawl_window(spark, fix_dir, tmp_path_factory):
    cfg = CrawlConfig(per_host_k=2, max_rounds=6, seen_sketch="cuckoo",
                      bloom_prefilter=True, recrawl_window=3)
    run_dir = str(tmp_path_factory.mktemp("recrawl_auto"))
    eng = CrawlEngine(spark, fix_dir, run_dir, cfg)
    eng.run()
    log = eng.cat.read("crawl_log").toPandas()
    # the loop's last eviction (after round 5) retired the round-2
    # cohort; nothing ran afterward to re-discover it, so those URLs
    # must be gone from the committed seen set — proof run() wires
    # evict_cohort on the configured window
    cohort2 = set(log[log["round"] == 2]["canon_url"])
    assert cohort2
    seen = {r["canon_url"] for r in eng.cat.read("seen").collect()}
    assert not (cohort2 & seen)
