"""Crawl-run analytics (plans/reports.py): invariants over a real run."""

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.plans import reports
from web_crawler_spark.plans.crawl import CrawlEngine


@pytest.fixture(scope="module")
def run_engine(spark, fix_dir, tmp_path_factory):
    run = str(tmp_path_factory.mktemp("reports_run"))
    eng = CrawlEngine(spark, fix_dir, run, CrawlConfig(per_host_k=2, max_rounds=4))
    eng.run()
    return eng


def test_politeness_audit_all_ok(run_engine):
    """The engine must PASS its own politeness audit — every host's
    min round gap ≥ its crawl_delay."""
    audit = reports.politeness_audit(run_engine.cat, run_engine.robots).collect()
    assert len(audit) > 0
    bad = [r for r in audit if not r.ok]
    assert not bad, bad


def test_dedup_rates_consistent_with_log(run_engine):
    rates = reports.dedup_rates(run_engine.cat)
    total = rates.agg(F.sum("fetched")).first()[0]
    assert total == run_engine.cat.read("crawl_log").count()
    last_cum = rates.orderBy(F.desc("round")).first()["cum_kept"]
    assert last_cum == run_engine.images_kept().count()


def test_host_summary_counts(run_engine):
    hs = reports.host_summary(run_engine.cat, top_n=5)
    rows = hs.collect()
    assert 0 < len(rows) <= 5
    # ordered by fetch count desc
    counts = [r.n_fetched for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n_kept <= r.n_fetched for r in rows)


def test_frontier_histogram_nonnegative(run_engine):
    h = reports.frontier_depth_histogram(run_engine.cat).collect()
    assert all(r.n_urls > 0 and r.n_hosts > 0 for r in h)


def test_crawl_frontier_join_shape(run_engine):
    j = reports.crawl_frontier_join(run_engine.cat)
    assert j.count() == run_engine.cat.read("crawl_log").count()
    assert j.filter(F.col("n_children") < 0).count() == 0
