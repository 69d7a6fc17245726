"""The graded core (BASELINE.json): crawl-order, seen-set, and per-row
invariants must match the reference oracle 100%, and runs must be
resumable from snapshot with identical results."""

import shutil

import numpy as np
import pytest

from oracle.refcrawler import crawl
from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.core import imagecodec
from web_crawler_spark.plans.crawl import CrawlEngine

CFG = CrawlConfig(per_host_k=2, max_rounds=4)
LOG_COLS = ["round", "canon_url", "host", "image_id", "priority", "discovered_seq", "status"]


@pytest.fixture(scope="module")
def engine_and_oracle(spark, fix_dir, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("run"))
    eng = CrawlEngine(spark, fix_dir, run_dir, CFG)
    eng.run()
    return eng, crawl(fix_dir, CFG)


def test_crawl_order_matches_oracle(engine_and_oracle):
    eng, res = engine_and_oracle
    elog = eng.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert len(elog) == len(res.crawl_log)
    m = elog.merge(res.crawl_log, on="fetch_seq", suffixes=("_e", "_o"))
    for c in LOG_COLS:
        assert (m[f"{c}_e"] == m[f"{c}_o"]).all(), f"column {c} diverges from oracle"


def test_seen_set_matches_oracle(engine_and_oracle):
    eng, res = engine_and_oracle
    eseen = {r.canon_url for r in eng.cat.read("seen").collect()}
    assert eseen == res.seen  # symmetric difference empty (BASELINE.md)


def test_metrics_match_oracle(engine_and_oracle):
    eng, res = engine_and_oracle
    em = (
        eng.cat.read("metrics").groupBy("round").sum().toPandas()
        .sort_values("round").reset_index(drop=True)
    )
    om = res.metrics
    for c in ["fetched", "kept", "dup_exact", "neardup_image", "neardup_caption",
              "rejected_robots", "rejected_seen"]:
        assert em[f"sum({c})"].tolist() == om[c].tolist(), c


def test_kept_rows_per_row_invariant(engine_and_oracle, fix_dir):
    """Every kept row: decoded pixels match the oracle's corpus row
    (exact for raw; PSNR ≥ 40 dB re-encode tolerance) + caption equality."""
    eng, res = engine_and_oracle
    kept = eng.images_kept().join(
        eng.corpus.select("image_id", "bytes", "w", "h", "fmt",
                          eng.corpus.caption.alias("corpus_caption")),
        "image_id",
    ).collect()
    okept = res.kept.set_index("fetch_seq")
    assert len(kept) == len(okept)
    import pyarrow.parquet as pq
    corpus = pq.read_table(f"{fix_dir}/corpus.parquet").to_pandas().set_index("image_id")
    for row in kept:
        o = okept.loc[row.fetch_seq]
        assert o["image_id"] == row.image_id
        assert row.caption == row.corpus_caption  # exact caption equality
        ref = corpus.loc[row.image_id]
        dec = imagecodec.decode(row.bytes, row.w, row.h, row.fmt)
        ref_dec = imagecodec.decode(ref["bytes"], int(ref["w"]), int(ref["h"]), ref["fmt"])
        assert imagecodec.psnr(dec, ref_dec) >= 40.0 or np.array_equal(dec, ref_dec)


def test_resume_equals_uninterrupted(spark, fix_dir, tmp_path_factory, engine_and_oracle):
    eng_full, _ = engine_and_oracle
    run_dir = str(tmp_path_factory.mktemp("resume"))
    e1 = CrawlEngine(spark, fix_dir, run_dir, CrawlConfig(per_host_k=2, max_rounds=2))
    e1.run()
    e2 = CrawlEngine(spark, fix_dir, run_dir, CFG)  # resumes rounds 2..3
    e2.run()
    a = eng_full.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    b = e2.cat.read("crawl_log").orderBy("fetch_seq").toPandas()
    assert a.equals(b)
