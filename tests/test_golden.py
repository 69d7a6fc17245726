"""Committed golden files (FIXTURES.md §1.6): both the oracle and the
Spark ENGINE must reproduce fixtures/golden/ exactly on the
dedup-covering fixture. This is also the dedup-path parity proof: the
golden log contains all four statuses (kept, dup_exact, neardup_image,
neardup_caption), so the engine's exact/pHash/MinHash dedup joins are
pinned against committed bytes, not just against a live oracle run."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from fixtures.make_golden import CFG, FIXTURE_PARAMS, GOLDEN_DIR, LOG_COLS, run_oracle
from fixtures.gen import generate
from web_crawler_spark.plans.crawl import CrawlEngine


@pytest.fixture(scope="module")
def dup_fix_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dupfix"))
    generate(d, **FIXTURE_PARAMS)
    return d


def _golden_log() -> pd.DataFrame:
    with open(os.path.join(GOLDEN_DIR, "crawl_order.jsonl")) as f:
        return pd.DataFrame([json.loads(l) for l in f])


def test_golden_covers_all_statuses():
    log = _golden_log()
    assert set(log["status"]) == {"kept", "dup_exact", "neardup_image", "neardup_caption"}


def test_oracle_matches_golden(dup_fix_dir):
    res, kept = run_oracle(dup_fix_dir)
    got = res.crawl_log[LOG_COLS].reset_index(drop=True)
    want = _golden_log()[LOG_COLS]
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    with open(os.path.join(GOLDEN_DIR, "seen_set.txt")) as f:
        assert sorted(res.seen) == f.read().splitlines()
    gk = pq.read_table(os.path.join(GOLDEN_DIR, "kept_rows.parquet")).to_pandas()
    pd.testing.assert_frame_equal(
        kept.reset_index(drop=True).astype(gk.dtypes.to_dict()), gk)


def test_engine_matches_golden(spark, dup_fix_dir, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("golden_run"))
    eng = CrawlEngine(spark, dup_fix_dir, run_dir, CFG)
    eng.run()
    got = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()[LOG_COLS]
    want = _golden_log()[LOG_COLS]
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    eseen = sorted(r["canon_url"] for r in eng.cat.read("seen").collect())
    with open(os.path.join(GOLDEN_DIR, "seen_set.txt")) as f:
        assert eseen == f.read().splitlines()
    gk = pq.read_table(os.path.join(GOLDEN_DIR, "kept_rows.parquet")).to_pandas()
    ek = (eng.images_kept().orderBy("fetch_seq")
          .select("fetch_seq", "image_id", "caption", "phash").toPandas())
    pd.testing.assert_frame_equal(ek.astype(gk.dtypes.to_dict()), gk)
