"""Reference crawler oracle — sequential, pure Python/numpy ground truth.

The reference snapshot at /root/reference is empty (SURVEY.md §0), so the
binding spec is BASELINE.json's north_star/north_rule: given the seed list
and politeness budget, the Spark frontier must reproduce the crawl
ordering and final URL-seen set 100%. This module is the executable
definition of those semantics; the Spark engine is graded against it.

FROZEN SEMANTICS (any change here must be mirrored in plans/crawl.py):

Round-based BSP politeness. State: seen set (canonical URLs; inserted at
*enqueue* time), frontier records (canon_url, host, priority=depth,
discovered_seq, ready_round), per-host next_round clock, global counters.

Round r:
 1. eligible = frontier rows with ready_round ≤ r and host_next[host] ≤ r
 2. per host, order by (priority, discovered_seq), take first
    cfg.per_host_k  ("politeness budget")
 3. batch = selected rows ordered by (priority, discovered_seq);
    truncated to the remaining global budget
 4. fetch each (lookup in the corpus by canon_url); assign fetch_seq in
    batch order
 5. every host fetched this round: host_next[host] = r + 1 + ceil(delay)
 6. dedup in fetch_seq order (global across rounds):
      a. exact: sha256(bytes); later copies → dup_exact
      b. near-dup, evaluated for exact-survivors only, against ALL
         earlier exact-survivors (regardless of their own near-dup
         status — this makes the predicate chain-free and join-
         expressible in Spark):
         image match  = same (w,h) ∧ hamming(phash) ≤ 2 ∧ caption equal
                        ∧ PSNR(decoded pair) ≥ 40 dB   → neardup_image
         caption match = ≥1 shared MinHash LSH band ∧ exact
                        3-shingle Jaccard ≥ 0.8        → neardup_caption
         (image checked first; else kept)
 7. discoveries: for every fetched row in batch order, out_links(i)
    in link order → raw url → canonicalize → if canon in seen: count
    rejected_seen; else insert seen, robots check (path prefix): if
    disallowed count rejected_robots (stays seen, never enqueued), else
    enqueue with priority=parent+1, ready_round=r+1, discovered_seq from
    the global counter (allowed-new only, in (parent fetch order, link
    position) order)
Stop when the frontier is empty, the global budget is spent, or
cfg.max_rounds reached.

priority_mode="authority" (round-r batch ordering only): hosts are
ranked by PageRank over the host-level link graph of everything FETCHED
in rounds < r (distinct src_host→dst_host pairs from each logged row's
out_links, self-host edges dropped; damping 0.85, cfg.authority_iters
power iterations, dangling mass re-injected uniformly). Ranks quantize
to floor(rank*1e6 + 0.5); batch order becomes (-rank_q, priority,
discovered_seq) with absent hosts at rank_q 0. Eligibility, per-host
politeness top-k and within-host order are UNCHANGED.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.core import imagecodec, minhash
from web_crawler_spark.core.urls import canonicalize_series, host_of_series, path_of_series
from web_crawler_spark.core.web import out_links, robots_allowed


@dataclass
class OracleResult:
    crawl_log: pd.DataFrame = None
    seen: set = field(default_factory=set)
    kept: pd.DataFrame = None
    metrics: pd.DataFrame = None


def load_fixture(fix_dir: str):
    corpus = pq.read_table(os.path.join(fix_dir, "corpus.parquet")).to_pandas()
    urls = pq.read_table(os.path.join(fix_dir, "urls.parquet")).to_pandas()
    with open(os.path.join(fix_dir, "seeds.txt")) as f:
        seeds = [l.strip() for l in f if l.strip()]
    with open(os.path.join(fix_dir, "robots.json")) as f:
        robots = json.load(f)
    return corpus, urls, seeds, robots


def _authority_q(log_rows: list[dict], canon_to_idx: dict, hosts_all,
                 n: int, iters: int, damping: float) -> dict[str, int]:
    """Sequential twin of the engine's _host_rank_q: numpy power
    iteration over the distinct host-level link graph of the fetched
    log so far, quantized to the shared 1e-6 grid. Matches
    plans/pipeline_ops.pagerank_df semantics: nodes = edge endpoints,
    dangling (no out-edge) mass re-injected uniformly, ranks sum to 1."""
    edges: set[tuple[str, str]] = set()
    for row in log_rows:
        i = canon_to_idx[row["canon_url"]]
        sh = row["host"]
        for j in out_links(i, n):
            dh = hosts_all.iloc[j]
            if dh != sh:
                edges.add((sh, dh))
    if not edges:
        return {}
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {h: k for k, h in enumerate(nodes)}
    nn = len(nodes)
    deg = np.zeros(nn)
    for u, _ in edges:
        deg[idx[u]] += 1
    rank = np.full(nn, 1.0 / nn)
    for _ in range(iters):
        contrib = np.zeros(nn)
        for u, v in edges:
            contrib[idx[v]] += rank[idx[u]] / deg[idx[u]]
        dangling = rank[deg == 0].sum()
        rank = (1.0 - damping) / nn + damping * (contrib + dangling / nn)
    return {h: int(math.floor(rank[idx[h]] * 1e6 + 0.5)) for h in nodes}


def crawl(fix_dir: str, cfg: CrawlConfig = CrawlConfig()) -> OracleResult:
    corpus, urls, seeds, robots = load_fixture(fix_dir)
    n = len(corpus)
    canon_all = canonicalize_series(urls["url"])
    hosts_all = host_of_series(canon_all)
    paths_all = path_of_series(canon_all)
    canon_to_idx = {c: i for i, c in enumerate(canon_all)}
    corpus_by_idx = corpus  # row i == image index i (generator invariant)

    def delay(host: str) -> float:
        return robots.get(host, {}).get("crawl_delay", cfg.default_delay)

    def allowed(host: str, path: str) -> bool:
        r = robots.get(host, {})
        return robots_allowed(path, r.get("disallow", []), r.get("allow", []))

    seen: set[str] = set()
    frontier: list[dict] = []
    host_next: dict[str, int] = {}
    seq = 0
    fetch_seq = 0
    log_rows: list[dict] = []
    metric_rows: list[dict] = []

    # --- seeds (file order), then sitemap URLs as depth-0 discoveries
    # ordered by (sitemap host, in-file position) — both part of the
    # enqueue-order contract the engine mirrors (plans/crawl.init_state)
    enqueue_urls = list(seeds)
    sm_dir = os.path.join(fix_dir, "sitemaps")
    if os.path.isdir(sm_dir):
        from web_crawler_spark.sources.robots import parse_sitemap_xml

        # sort by the host STEM, not the '<host>.xml' filename — the
        # engine orders sitemap rows by (host, pos), and 'foo.co.xml' vs
        # 'foo.co-op.example.xml' sort differently once '.xml' is glued on
        # ('-' 0x2D < '.' 0x2E)
        for fn in sorted(
            (f for f in os.listdir(sm_dir) if f.endswith(".xml")),
            key=lambda f: f[:-4],
        ):
            with open(os.path.join(sm_dir, fn)) as f:
                enqueue_urls.extend(parse_sitemap_xml(f.read()))
    seed_canon = canonicalize_series(pd.Series(enqueue_urls))
    seed_host = host_of_series(seed_canon)
    seed_path = path_of_series(seed_canon)
    for c, h, p in zip(seed_canon, seed_host, seed_path):
        if c in seen:
            continue
        seen.add(c)
        if not allowed(h, p):
            continue
        frontier.append({"canon": c, "host": h, "prio": 0, "seq": seq, "ready": 0})
        seq += 1

    sha_first: dict[str, int] = {}
    # exact-dedup survivors, in fetch order: (fetch_seq, idx, w, h, phash,
    # caption, band_tuple, decoded-pixels lazily)
    survivors: list[dict] = []
    decoded: dict[int, np.ndarray] = {}

    def decode_idx(i: int) -> np.ndarray:
        if i not in decoded:
            row = corpus_by_idx.iloc[i]
            decoded[i] = imagecodec.decode(row["bytes"], int(row["w"]), int(row["h"]), row["fmt"])
        return decoded[i]

    budget_left = cfg.global_budget if cfg.global_budget is not None else float("inf")

    use_auth = getattr(cfg, "priority_mode", "bfs") == "authority"

    for r in range(cfg.max_rounds):
        if not frontier or budget_left <= 0:
            break
        # rank-as-of semantics mirror the engine: round r uses the rank
        # computed from rounds < r - (r % authority_refresh_every)
        k_ref = max(1, int(getattr(cfg, "authority_refresh_every", 1)))
        rank_round = r - (r % k_ref)
        hist = [row for row in log_rows if row["round"] < rank_round]
        if use_auth and rank_round > 0 and hist:
            auth = _authority_q(hist, canon_to_idx, hosts_all, n,
                                cfg.authority_iters, cfg.authority_damping)
            key = lambda f: (-auth.get(f["host"], 0), f["prio"], f["seq"])
        else:
            key = lambda f: (f["prio"], f["seq"])
        eligible = [f for f in frontier if f["ready"] <= r and host_next.get(f["host"], 0) <= r]
        by_host: dict[str, list[dict]] = {}
        for f in sorted(eligible, key=key):
            by_host.setdefault(f["host"], []).append(f)
        selected = []
        for h, fs in by_host.items():
            selected.extend(fs[: cfg.per_host_k])
        batch = sorted(selected, key=key)
        if budget_left < len(batch):
            batch = batch[: int(budget_left)]
        if not batch:
            continue
        budget_left -= len(batch)
        batch_keys = {(f["prio"], f["seq"]) for f in batch}
        frontier = [f for f in frontier if (f["prio"], f["seq"]) not in batch_keys]
        for h in {f["host"] for f in batch}:
            host_next[h] = r + 1 + int(math.ceil(delay(h)))

        m = {"round": r, "fetched": 0, "kept": 0, "dup_exact": 0, "neardup_image": 0,
             "neardup_caption": 0, "rejected_robots": 0, "rejected_seen": 0}

        fetched_rows = []
        for f in batch:
            i = canon_to_idx[f["canon"]]
            row = corpus_by_idx.iloc[i]
            sha = hashlib.sha256(row["bytes"]).hexdigest()
            status = None
            if sha in sha_first:
                status = "dup_exact"
            else:
                sha_first[sha] = fetch_seq
                bands = tuple(minhash.caption_band_hashes([row["caption"]])[0].tolist())
                me = {"fetch_seq": fetch_seq, "idx": i, "w": int(row["w"]), "h": int(row["h"]),
                      "phash": int(row["phash"]) & 0xFFFFFFFFFFFFFFFF,
                      "caption": row["caption"], "bands": bands}
                for s in survivors:
                    if (s["w"], s["h"]) == (me["w"], me["h"]) and \
                       bin(s["phash"] ^ me["phash"]).count("1") <= cfg.phash_max_hamming and \
                       s["caption"] == me["caption"] and \
                       imagecodec.psnr(decode_idx(s["idx"]), decode_idx(i)) >= cfg.psnr_floor:
                        status = "neardup_image"
                        break
                if status is None:
                    for s in survivors:
                        if set(s["bands"]) & set(bands) and \
                           minhash.jaccard3(s["caption"], me["caption"]) >= cfg.jaccard_theta:
                            status = "neardup_caption"
                            break
                if status is None:
                    status = "kept"
                survivors.append(me)
            log_rows.append({"fetch_seq": fetch_seq, "round": r, "canon_url": f["canon"],
                             "host": f["host"], "image_id": row["image_id"],
                             "priority": f["prio"], "discovered_seq": f["seq"],
                             "status": status})
            m["fetched"] += 1
            m[status] += 1
            fetched_rows.append((f, i))
            fetch_seq += 1

        # --- discoveries
        for f, i in fetched_rows:
            for j in out_links(i, n):
                c = canon_all.iloc[j]
                if c in seen:
                    m["rejected_seen"] += 1
                    continue
                seen.add(c)
                h2, p2 = hosts_all.iloc[j], paths_all.iloc[j]
                if not allowed(h2, p2):
                    m["rejected_robots"] += 1
                    continue
                frontier.append({"canon": c, "host": h2, "prio": f["prio"] + 1,
                                 "seq": seq, "ready": r + 1})
                seq += 1
        metric_rows.append(m)

    log = pd.DataFrame(log_rows)
    kept = log[log["status"] == "kept"].copy() if len(log) else log
    return OracleResult(crawl_log=log, seen=seen, kept=kept,
                        metrics=pd.DataFrame(metric_rows))
