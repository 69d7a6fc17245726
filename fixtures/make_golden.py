"""Emit the committed golden files (FIXTURES.md §1.6) from the oracle.

Runs oracle/refcrawler.py on the dedup-covering deterministic fixture
(n=300, n_hosts=20, seed 42 — chosen so the fetch log contains all four
statuses: kept, dup_exact, neardup_image, neardup_caption) with
per_host_k=4, max_rounds=8, and writes, under fixtures/golden/:

  crawl_order.jsonl  — the full fetch sequence, one JSON object per row
  seen_set.txt       — sorted canonical URLs of the final seen set
  kept_rows.parquet  — (fetch_seq, image_id, caption, phash) of kept rows

Regenerate with `python fixtures/make_golden.py` after any intentional
semantics change; tests/test_golden.py diffs the oracle (and, through
the oracle-parity suite, the engine) against these files.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from fixtures.gen import generate
from oracle.refcrawler import crawl
from web_crawler_spark.config import CrawlConfig

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
FIXTURE_PARAMS = {"n": 300, "n_hosts": 20}
CFG = CrawlConfig(per_host_k=4, max_rounds=8)
LOG_COLS = ["fetch_seq", "round", "canon_url", "host", "image_id",
            "priority", "discovered_seq", "status"]


def run_oracle(fix_dir: str | None = None):
    if fix_dir is None:
        fix_dir = tempfile.mkdtemp(prefix="wcs_golden_fix_")
        generate(fix_dir, **FIXTURE_PARAMS)
    res = crawl(fix_dir, CFG)
    corpus = pq.read_table(
        os.path.join(fix_dir, "corpus.parquet"),
        columns=["image_id", "caption", "phash"],
    ).to_pandas().set_index("image_id")
    kept = res.kept[["fetch_seq", "image_id"]].copy()
    kept["caption"] = [corpus.loc[i, "caption"] for i in kept["image_id"]]
    kept["phash"] = [int(corpus.loc[i, "phash"]) for i in kept["image_id"]]
    return res, kept


def main() -> None:
    res, kept = run_oracle()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(GOLDEN_DIR, "crawl_order.jsonl"), "w") as f:
        for _, row in res.crawl_log[LOG_COLS].iterrows():
            f.write(json.dumps({c: (int(row[c]) if c not in
                                    ("canon_url", "host", "image_id", "status")
                                    else row[c]) for c in LOG_COLS}) + "\n")
    with open(os.path.join(GOLDEN_DIR, "seen_set.txt"), "w") as f:
        f.write("\n".join(sorted(res.seen)) + "\n")
    pq.write_table(
        pa.table({
            "fetch_seq": pa.array(kept["fetch_seq"].astype("int64"), pa.int64()),
            "image_id": pa.array(kept["image_id"], pa.string()),
            "caption": pa.array(kept["caption"], pa.string()),
            "phash": pa.array(kept["phash"].astype("int64"), pa.int64()),
        }),
        os.path.join(GOLDEN_DIR, "kept_rows.parquet"),
    )
    print(f"golden: {len(res.crawl_log)} log rows, {len(res.seen)} seen, "
          f"{len(kept)} kept -> {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
