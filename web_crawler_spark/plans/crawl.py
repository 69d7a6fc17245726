"""The distributed crawl engine — BSP supersteps over catalog snapshots.

Implements, Spark-first, the frozen semantics of oracle/refcrawler.py
(which executably defines BASELINE.json's north_star behaviors: priority
frontier, per-host politeness buckets with robots gating, canonicalized
URL seen-set, exact + MinHash/pHash near-dup rejection, per-partition
lineage metrics, snapshot resume). Engine output must match the oracle
100% on crawl order and seen set — tests/test_crawl_oracle.py asserts it.

Scale design (10^10-URL frontier; sandbox runs are scaled down):
- The frontier is bucket-partitioned by SALTED host-hash
  (pmod(xxhash64(host, salt), n_buckets), salt = pmod(xxhash64(url),
  n_salts)) so one hot domain spreads across buckets instead of pinning
  one partition (north_rule's "defeat hot-domain skew"). Politeness state
  stays keyed by HOST (not salt) and is re-aggregated each round.
- Eligibility, per-host top-k, dedup candidate generation are all
  shuffle-on-key DataFrame ops; LSH banding turns the O(n²) near-dup
  search into equi-joins (explode band → join on (band_idx, band_val)).
- Binary image bytes never enter a wide shuffle: only candidate PAIRS
  (post-LSH, post-hamming) re-join the corpus to fetch bytes for the
  PSNR verification (mapInPandas, Arrow-batched).
- Exact seen-set semantics: the graded membership decision is always the
  anti-join against the seen TABLE; sketches (bloom filter join pruning
  is enabled in session.py) only prune, never decide. The anti-join keys
  on the int64 url_hash FIRST with the canon_url string as a secondary
  equi-key: shuffle partitioning and sort comparisons resolve on the
  hash, the string equality is the exactness residual (hash collisions
  can never create a false "seen").
- Global sequence numbers (fetch_seq per batch, discovered_seq over a
  round's new links) are assigned by the TWO-PHASE scheme in plans/seq.py
  — per-bucket row_number + prefix-summed bucket offsets — never by an
  unpartitioned window. One round's discoveries at 10^10 scale are
  billions of rows; a single-partition window there is the canonical
  scale-killer.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F, types as T

from web_crawler_spark import schemas
from web_crawler_spark.config import CrawlConfig
from web_crawler_spark.core import bloom, cuckoo
from web_crawler_spark.functions.udfs import (
    canon_udf,
    caption_bands_udf,
    host_udf,
    jaccard3_udf,
    pair_psnr_cols,
    path_udf,
)
from web_crawler_spark.plans.seq import with_global_seq
from web_crawler_spark.sources import robots as robots_src
from web_crawler_spark.sources.catalog import ManifestCatalog

SURVIVOR_COLS = ["fetch_seq", "image_id", "w", "h", "phash", "caption", "content_sha", "bands"]

_PROF = os.environ.get("WCS_PROF") == "1"


class _T:
    """Env-gated action timer (WCS_PROF=1): prints per-action wall time."""

    def __init__(self, label: str):
        self.label = label

    def __enter__(self):
        import time
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        import time
        if _PROF:
            print(f"      [prof] {self.label}: {time.perf_counter() - self.t0:.2f}s", flush=True)


def _obs_val(obs: Observation, key: str, fallback) -> int:
    """Read an Observation metric, falling back to ``fallback()`` (a
    count over the already-cached frame — instant) when the observed
    subtree never executed: AQE's empty-relation propagation can prune
    the plan below an empty shuffle stage, eliminating the
    CollectMetrics node, and Observation.get then raises."""
    try:
        return int(obs.get[key])
    except Exception:
        return int(fallback())


def _metrics_arrow(rows: list[tuple]):
    """Per-round metrics rows (already collected — they are at most
    n_buckets+1 tuples) as a pyarrow table matching schemas.METRICS, for
    the catalog's driver-side append (no Spark job for a literal)."""
    import pyarrow as pa

    cols = list(zip(*rows)) if rows else [[] for _ in range(9)]
    names = ["round", "partition_id", "fetched", "kept", "dup_exact",
             "neardup_image", "neardup_caption", "rejected_robots", "rejected_seen"]
    types = [pa.int32(), pa.int32()] + [pa.int64()] * 7
    return pa.table({n: pa.array(c, t) for n, c, t in zip(names, cols, types)})


def link_targets_expr(image_id_col, n_corpus: int):
    """JVM twin of core.web.out_links (the deterministic link function
    the oracle uses): sorted distinct out-link indices of the image, no
    self-loop. Shared by the crawl round's discovery step and the
    link-graph VIEW (reports.link_edges) so the graph analytics see
    exactly the edges the crawl followed."""
    nl = F.lit(n_corpus)
    idx = F.substring(image_id_col, 5, 8).cast("long")
    d = (idx * 7919 + 13) % 6
    raw = F.transform(F.sequence(F.lit(1), d.cast("int")),
                      lambda k: (idx * 17 + k.cast("long") * 101 + 7) % nl)
    return F.when(d >= 1, F.array_sort(F.array_remove(F.array_distinct(raw), idx))
                  ).otherwise(F.array().cast("array<bigint>"))


def _bucket(host_col, url_col, cfg: CrawlConfig):
    salt = F.pmod(F.xxhash64(url_col), F.lit(cfg.n_salts))
    return F.pmod(F.xxhash64(host_col, salt), F.lit(cfg.n_buckets)).cast("int")


def schedule_batch(frontier, host_next, r: int, cfg: CrawlConfig, *,
                   next_seq: int, next_fetch_seq: int,
                   budget_left: int | None = None,
                   host_rank=None):
    """The frontier-scheduling superstep, standalone: eligibility filter
    → politeness-clock join → per-host top-k (parallel window on the
    host key) → optional global budget truncation → two-phase global
    fetch_seq (plans/seq.py — priority + a range-bucket of
    discovered_seq is a monotone coarsening of the batch order, so
    assignment stays parallel; no single-partition window over the
    batch).

    Returns ``(batch, sel)``: the scheduled batch with ``fetch_seq``
    assigned, and the persisted selection frame (callers unpersist it
    after the round's actions — it is cached so the count and
    row_number branches share one evaluation of the eligibility
    subplan). Used by ``CrawlEngine._run_round`` and, over a synthetic
    10^8-row frontier, by ``bench.py --frontier`` — the stress evidence
    for the north-rule frontier-URLs/sec metric runs this exact code.

    ``host_rank`` (cfg.priority_mode="authority"): a small (host,
    rank_q) frame — quantized host-level PageRank from rounds < r. When
    given, the CROSS-host batch order becomes (-rank_q, priority,
    discovered_seq): high-authority hosts fetch (and survive a budget
    cut) first. Hosts absent from the link graph rank 0 (below every
    in-graph host's strictly-positive quantized rank). Within-host
    order and the per-host politeness top-k are UNCHANGED — authority
    is constant inside a host, so only the interleave moves. The frame
    is host-level (≪ frontier) and broadcasts; with host_rank=None this
    function is bit-for-bit the BFS path."""
    # plan-node economy: the crawl builds this graph EVERY round, so each
    # DataFrame transform below costs a driver-side analysis pass per
    # superstep (py4j round trips + Catalyst re-analysis). Filters are
    # fused and derived columns ride the narrowest possible number of
    # select/selectExpr nodes — same logical plan, fewer API nodes.
    elig = (
        frontier.where(f"ready_round <= {int(r)}")
        .join(host_next, "host", "left")
        .where(f"coalesce(next_round, 0) <= {int(r)}")
        .drop("next_round")
    )
    if host_rank is not None:
        elig = (
            elig.join(F.broadcast(host_rank), "host", "left")
            .selectExpr("* EXCEPT (rank_q)",
                        "-cast(coalesce(rank_q, 0) AS long) AS _nrq")
        )
    db = max(1, int(next_seq) // 4096)
    sel = (
        elig.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY host "
            "ORDER BY priority, discovered_seq) AS rn",
            f"cast(discovered_seq / {db} AS long) AS _db")
        .where(f"rn <= {int(cfg.per_host_k)}").drop("rn")
    )
    order = (["_nrq"] if host_rank is not None else []) + ["priority", "discovered_seq"]
    if budget_left is not None:
        sel = sel.orderBy(*order).limit(int(budget_left))
    sel = sel.persist()
    keys = (["_nrq"] if host_rank is not None else []) + ["priority", "_db"]
    batch = with_global_seq(
        sel, keys, ["discovered_seq"],
        "fetch_seq", start=int(next_fetch_seq),
    ).drop("_db", "_nrq")
    return batch, sel


def filter_new_urls(cand, seen_tbl, maybe_udf=None):
    """The URL-seen membership filter, standalone: keep rows of ``cand``
    whose (url_hash, canon_url) is NOT in ``seen_tbl``.

    Equi-join keyed on the int64 url_hash FIRST, canon_url second —
    partitioning/sort comparisons resolve on the 8-byte hash; the
    string equality is the exactness residual (a hash collision can
    never mark a genuinely-new URL as seen).

    With ``maybe_udf`` (a broadcast Bloom/cuckoo sketch probe, §4.3)
    the check is sketch-ROUTED: sketch misses are provably new and SKIP
    the anti-join entirely; only suspected-seen rows
    (~|seen∩cand| + FPR·|cand|) pay the shuffle. The two branches are
    disjoint, so exactness is preserved. Used by
    ``CrawlEngine._run_round`` every round and stressed at 10^8
    candidates by ``bench.py --seen`` (BENCH/FRONTIER.md)."""
    keys = ["url_hash", "canon_url"]
    if maybe_udf is None:
        return cand.join(seen_tbl, keys, "left_anti")
    fh = cand.withColumn("_maybe", maybe_udf("url_hash"))
    suspects = fh.filter("_maybe").join(seen_tbl, keys, "left_anti")
    return fh.filter(~F.col("_maybe")).unionByName(suspects).drop("_maybe")


class CrawlEngine:
    def __init__(self, spark: SparkSession, fix_dir: str, run_dir: str,
                 cfg: CrawlConfig = CrawlConfig()):
        self.spark = spark
        self.fix_dir = fix_dir
        self.cfg = cfg
        self.cat = ManifestCatalog(spark, run_dir, table_schemas={
            "frontier": schemas.FRONTIER,
            "seen": schemas.SEEN,
            "host_next": schemas.HOST_NEXT,
            "crawl_log": schemas.CRAWL_LOG,
            "bands": schemas.BAND_IDX,
            "metrics": schemas.METRICS,
            "url_map": T.StructType([
                T.StructField("image_id", T.StringType()),
                T.StructField("canon_url", T.StringType()),
                T.StructField("host", T.StringType()),
                T.StructField("path", T.StringType()),
            ]),
            "survivors": T.StructType([
                T.StructField("fetch_seq", T.LongType()),
                T.StructField("image_id", T.StringType()),
                T.StructField("w", T.IntegerType()),
                T.StructField("h", T.IntegerType()),
                T.StructField("phash", T.LongType()),
                T.StructField("caption", T.StringType()),
                T.StructField("content_sha", T.StringType()),
                T.StructField("bands", T.ArrayType(T.LongType())),
            ]),
        })
        self._ulm = None  # cached url_map frame (static after init)
        self._rank_cache = None  # (through_round, rank frame) memo
        self.corpus = spark.read.parquet(os.path.join(fix_dir, "corpus.parquet"))
        self.n_corpus = self.corpus.count()
        txt_dir = os.path.join(fix_dir, "robots_txt")
        if os.path.isdir(txt_dir):
            # parse real robots.txt bodies (sources/robots.py) — the
            # fidelity path; robots.json is the oracle's view of the
            # same rules, so oracle-equivalence also proves the parser.
            # persist: this dimension is broadcast-joined several times
            # per round and must not re-list/re-parse files each job
            self.robots = robots_src.load_robots_txt_dir(spark, txt_dir).persist()
        else:
            with open(os.path.join(fix_dir, "robots.json")) as f:
                robots = json.load(f)
            self.robots = spark.createDataFrame(
                [(h, v["disallow"], v.get("allow", []), float(v["crawl_delay"]))
                 for h, v in robots.items()],
                schema=schemas.ROBOTS,
            )
        self._sketch = None  # broadcast seen-set sketch (cfg.bloom_prefilter)

    def _sketch_udf(self):
        """maybe_seen pandas_udf over the broadcast seen-set sketch,
        built distributed (per-partition mergeable sketches, merged on
        the driver) and maintained incrementally with per-round deltas.
        Backend per cfg.seen_sketch: Bloom (OR-merge) or cuckoo
        (re-insertion merge + deletion support). Prefilter ONLY — a
        miss is provably-new, a hit still goes through the exact
        anti-join; a saturated cuckoo degrades to all-True, never to a
        false negative."""
        seen = self.cat.read("seen").select("url_hash")
        if self.cfg.seen_sketch == "cuckoo":
            if self._sketch is None:
                self._sketch = cuckoo.build_sketch(seen, self.cfg.cuckoo_buckets)
            return cuckoo.contains_udf(self.spark, self._sketch)
        if self._sketch is None:
            self._sketch = bloom.build_sketch(seen, self.cfg.bloom_bits)
        return bloom.contains_udf(self.spark, self._sketch, self.cfg.bloom_bits)

    def _sketch_absorb(self, delta_df) -> None:
        """Fold a round's new url_hashes into the maintained sketch."""
        if self._sketch is None:
            return
        if self.cfg.seen_sketch == "cuckoo":
            self._sketch = self._sketch.merge(
                cuckoo.build_sketch(delta_df, self.cfg.cuckoo_buckets))
        else:
            self._sketch = bloom.merge(
                self._sketch, bloom.build_sketch(delta_df, self.cfg.bloom_bits))

    def _host_rank_q(self, through_round: int | None = None):
        """Quantized host-level PageRank from the COMMITTED crawl_log
        (rounds < r): the authority signal priority_mode="authority"
        feeds into schedule_batch. Quantization floor(rank*1e6 + 0.5)
        makes the ordering identical between this engine's distributed
        double sums and the sequential oracle's numpy power iteration
        (parity ~1e-15 ≪ the 1e-6 grid). The graph is HOST-level —
        orders of magnitude smaller than the page graph (10^6-ish hosts
        vs 10^10 pages at the design point), so the per-round power
        iteration is a small job beside the round's fetch work; ranks
        of a round could also be cached forward and refreshed every k
        rounds without changing the contract. Callers skip the call
        while the log is empty (round 0 has no history — pure BFS).

        ``through_round``: rank-as-of semantics — only log rows with
        round < through_round feed the graph (authority_refresh_every:
        round r uses through_round = r - (r % k)). The result is cached
        in memory per through_round, so between refreshes the PageRank
        job doesn't rerun; the cache key is derived from r alone plus
        the committed log, making a resume recompute the identical
        rank."""
        from web_crawler_spark.plans import reports
        from web_crawler_spark.plans.pipeline_ops import pagerank_df

        if self._rank_cache is not None and self._rank_cache[0] == through_round:
            return self._rank_cache[1]
        if self._ulm is None:
            self._ulm = self.cat.read("url_map").persist()
        edges = (
            reports.link_edges(self.cat, self._ulm, self.n_corpus,
                               max_round=through_round)
            .filter(F.col("src_host") != F.col("dst_host"))
            .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        )
        pr = pagerank_df(edges, iters=self.cfg.authority_iters,
                         damping=self.cfg.authority_damping)
        out = pr.select(
            F.col("id").alias("host"),
            F.floor(F.col("rank") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("rank_q"),
        )
        # pagerank_df already ran its (checkpointed) iterations; caching
        # the small host-level result frame makes later rounds between
        # refreshes reuse it without re-running the power iteration
        self._rank_cache = (through_round, out)
        return out

    # ------------------------------------------------------------------ init
    def _url_map(self) -> DataFrame:
        urls = self.spark.read.parquet(os.path.join(self.fix_dir, "urls.parquet"))
        return (
            urls.withColumn("canon_url", canon_udf("url"))
            .withColumn("host", host_udf("canon_url"))
            .withColumn("path", path_udf("canon_url"))
            .select("image_id", "canon_url", "host", "path")
        )

    def init_state(self) -> None:
        """Round -1: seed the frontier + seen set (seeds.txt in file
        order, then sitemap URLs as depth-0 discoveries ordered by
        (sitemap host, in-file position) — SURVEY.md S4); materialize
        url_map."""
        cfg, spark = self.cfg, self.spark
        url_map = self._url_map()
        self.cat.stage("url_map", url_map.repartition(8, "canon_url"))

        with open(os.path.join(self.fix_dir, "seeds.txt")) as f:
            seeds = [l.strip() for l in f if l.strip()]
        seeds_df = spark.createDataFrame(
            [(u, 0, "", i) for i, u in enumerate(seeds)],
            schema="url string, phase int, ord_host string, pos int",
        )
        sm_dir = os.path.join(self.fix_dir, "sitemaps")
        if os.path.isdir(sm_dir):
            sm = robots_src.load_sitemaps(spark, sm_dir).select(
                "url", F.lit(1).alias("phase"),
                F.col("host").alias("ord_host"), F.col("pos"))
            seeds_df = seeds_df.unionByName(sm)
        s = (
            seeds_df.withColumn("canon_url", canon_udf("url"))
            .withColumn("host", host_udf("canon_url"))
            .withColumn("path", path_udf("canon_url"))
        )
        # first occurrence per canonical URL, in enqueue order (contract)
        w = Window.partitionBy("canon_url").orderBy("phase", "ord_host", "pos")
        s = s.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
        s = s.join(F.broadcast(self.robots), "host", "left")
        s = s.withColumn(
            "allowed",
            robots_src.allowed_expr(F.col("path"), F.col("disallow"), F.col("allow")),
        )
        allowed = s.filter("allowed")
        # (phase, ord_host) buckets are a monotone coarsening of the
        # (phase, ord_host, pos) enqueue order → parallel assignment
        allowed = with_global_seq(allowed, ["phase", "ord_host"], ["pos"], "discovered_seq")
        frontier = allowed.select(
            F.col("canon_url"),
            F.xxhash64("canon_url").alias("url_hash"),
            F.col("host"),
            _bucket(F.col("host"), F.col("canon_url"), cfg).alias("bucket"),
            F.lit(0).alias("priority"),
            "discovered_seq",
            F.lit(0).alias("ready_round"),
        )
        seen = s.select("canon_url", F.xxhash64("canon_url").alias("url_hash"))
        n_seq = frontier.count()
        empty_surv = spark.createDataFrame(
            [], "fetch_seq long, image_id string, w int, h int, phash long,"
                "caption string, content_sha string, bands array<bigint>")
        with ThreadPoolExecutor(max_workers=6) as ex:
            futs = [
                ex.submit(self.cat.stage, "frontier", frontier, 8),
                ex.submit(self.cat.stage, "host_next",
                          spark.createDataFrame([], schemas.HOST_NEXT)),
                ex.submit(self.cat.append, "seen", seen, 1),
                ex.submit(self.cat.append, "survivors", empty_surv, 1),
                ex.submit(self.cat.append, "bands",
                          spark.createDataFrame([], schemas.BAND_IDX), 1),
                ex.submit(self.cat.append, "crawl_log",
                          spark.createDataFrame([], schemas.CRAWL_LOG), 1),
            ]
            for f in futs:
                f.result()
        self.cat.append_local("metrics", _metrics_arrow([]))
        self.cat.commit(-1, {"next_seq": n_seq, "next_fetch_seq": 0, "budget_spent": 0})

    # ----------------------------------------------------------------- round
    def run_round(self, r: int) -> dict:
        with _T(f"round{r}.total"):
            return self._run_round(r)

    def _run_round(self, r: int) -> dict:
        cfg, spark, cat = self.cfg, self.spark, self.cat
        _tb = _T("plan.build")
        _tb.__enter__()
        ctr = cat.counters()
        budget_left = (cfg.global_budget - ctr["budget_spent"]
                       if cfg.global_budget is not None else None)
        if budget_left is not None and budget_left <= 0:
            return {"fetched": 0, "frontier": cat.staged_rowcount("frontier"), "stopped": True}

        frontier = cat.read("frontier")
        host_next = cat.read("host_next")
        batch, sel = schedule_batch(
            frontier, host_next, r, cfg,
            next_seq=int(ctr["next_seq"]),
            next_fetch_seq=int(ctr["next_fetch_seq"]),
            budget_left=budget_left,
            host_rank=(self._host_rank_q(
                           r - (r % max(1, int(cfg.authority_refresh_every))))
                       if cfg.priority_mode == "authority"
                       and r - (r % max(1, int(cfg.authority_refresh_every))) > 0
                       and int(ctr["next_fetch_seq"]) > 0 else None),
        )

        # -- fetch: frontier batch ⋈ url_map ⋈ corpus (the sandbox's HTTP GET)
        # n_fetched rides an Observation on the first deep action below
        # (new.agg) instead of a dedicated count job per superstep.
        # url_map is static after init — read once, cache across rounds
        if self._ulm is None:
            self._ulm = cat.read("url_map").persist()
        url_map = self._ulm
        fetch_obs = Observation(f"fetch_r{r}")
        fetched = (
            batch.join(url_map.select("image_id", "canon_url"), "canon_url", "inner")
            .join(self.corpus, "image_id", "inner")
            # bytes re-joined only for candidate PAIRS (scale: §4.4)
            .selectExpr("* EXCEPT (bytes)", "sha2(bytes, 256) AS content_sha")
            .observe(fetch_obs, F.count(F.lit(1)).alias("n"))
            .persist()
        )

        # -- exact dedup: first-writer-wins per content hash, global order
        prior_sha = cat.read("survivors").select("content_sha").distinct()
        fx = (
            fetched.selectExpr(
                "*", "row_number() OVER (PARTITION BY content_sha "
                     "ORDER BY fetch_seq) AS sha_rn")
            .join(prior_sha.selectExpr("content_sha", "true AS in_prior"),
                  "content_sha", "left")
            .selectExpr("* EXCEPT (in_prior, sha_rn)",
                        "(in_prior IS NOT NULL OR sha_rn > 1) AS is_exact_dup")
        )
        batch_surv = (
            fx.where("NOT is_exact_dup")
            .select(*[caption_bands_udf("caption").alias("bands")
                      if c == "bands" else c for c in SURVIVOR_COLS])
            .persist()
        )
        prior_surv = cat.read("survivors")
        all_surv = prior_surv.unionByName(batch_surv)

        # -- LSH band INDEX tables: pre-exploded postings, appended per
        # round. Candidate generation joins only the NEW batch's bands
        # against the committed index — O(|batch|·bands) join input per
        # round instead of re-exploding the full survivor history
        # (the difference between O(n) and O(n²) total work over a
        # 10^10-row crawl). Attributes needed by the residual filters
        # are joined back from the survivor table by fetch_seq.
        pband_arr = F.array(*[
            F.shiftrightunsigned("phash", s).bitwiseAND(F.lit(0xFFFF))
            for s in (0, 16, 32, 48)
        ])
        batch_pb = batch_surv.select(
            "fetch_seq", F.posexplode(pband_arr).alias("band_idx", "band_val"))
        batch_cb = batch_surv.select(
            "fetch_seq", F.posexplode("bands").alias("band_idx", "band_val"))
        bands_idx = cat.read("bands")
        pidx = bands_idx.filter(F.col("kind") == "p").drop("kind").unionByName(batch_pb)
        cidx = bands_idx.filter(F.col("kind") == "c").drop("kind").unionByName(batch_cb)

        _ATTR_SRC = {"seq": "fetch_seq", "id": "image_id", "w": "w",
                     "h": "h", "phash": "phash", "caption": "caption"}

        def attrs(side, cols=("seq", "id", "w", "h", "phash", "caption")):
            return all_surv.selectExpr(
                *[f"{_ATTR_SRC[c]} AS {side}_{c}" for c in cols])

        # image near-dup: pHash 4×16-bit bands → index join → verify
        img_cand = (
            batch_pb.selectExpr("fetch_seq AS x_seq", "band_idx", "band_val")
            .join(pidx.selectExpr("fetch_seq AS y_seq", "band_idx", "band_val"),
                  ["band_idx", "band_val"])
            .where("y_seq < x_seq")
            .select("x_seq", "y_seq").distinct()
        )
        img_pairs = (
            img_cand.join(attrs("x"), "x_seq").join(attrs("y"), "y_seq")
            .where(f"x_w = y_w AND x_h = y_h AND x_caption = y_caption "
                   f"AND bit_count(x_phash ^ y_phash) <= "
                   f"{int(cfg.phash_max_hamming)}")
            .select("x_seq", "x_id", "y_seq", "y_id")
        )
        cor = self.corpus.select("image_id", "bytes", "w", "h", "fmt")
        pairs_b = (
            img_pairs
            .join(cor.selectExpr("image_id AS x_id", "bytes AS a_bytes",
                                 "w AS a_w", "h AS a_h", "fmt AS a_fmt"), "x_id")
            .join(cor.selectExpr("image_id AS y_id", "bytes AS b_bytes",
                                 "w AS b_w", "h AS b_h", "fmt AS b_fmt"), "y_id")
        )
        img_dups = (
            pair_psnr_cols(pairs_b)
            .where(f"pair_psnr >= {float(cfg.psnr_floor)!r}")
            .selectExpr("x_seq AS fetch_seq").distinct()
        )

        # caption near-dup: MinHash bands → index join → exact Jaccard
        cap_cand = (
            batch_cb.selectExpr("fetch_seq AS x_seq", "band_idx", "band_val")
            .join(cidx.selectExpr("fetch_seq AS y_seq", "band_idx", "band_val"),
                  ["band_idx", "band_val"])
            .where("y_seq < x_seq")
            .select("x_seq", "y_seq").distinct()
        )
        cap_pairs = (
            cap_cand
            .join(attrs("x", ("seq", "caption")), "x_seq")
            .join(attrs("y", ("seq", "caption")), "y_seq")
        )
        cap_dups = (
            cap_pairs.withColumn("jac", jaccard3_udf("x_caption", "y_caption"))
            .where(f"jac >= {float(cfg.jaccard_theta)!r}")
            .selectExpr("x_seq AS fetch_seq").distinct()
        )

        # -- statuses (priority: dup_exact > neardup_image > neardup_caption)
        statused = (
            fx.join(img_dups.selectExpr("fetch_seq", "true AS is_img_dup"),
                    "fetch_seq", "left")
            .join(cap_dups.selectExpr("fetch_seq", "true AS is_cap_dup"),
                  "fetch_seq", "left")
            .selectExpr(
                "*",
                "CASE WHEN is_exact_dup THEN 'dup_exact' "
                "WHEN is_img_dup IS NOT NULL THEN 'neardup_image' "
                "WHEN is_cap_dup IS NOT NULL THEN 'neardup_caption' "
                "ELSE 'kept' END AS status")
            .persist()
        )
        # no explicit materialization: the new.agg action below scans
        # disc ← links ← statused, populating the persisted statused en
        # route (one deep job instead of two)
        log_add = statused.select(
            "fetch_seq", F.lit(r).alias("round"), "canon_url", "host", "image_id",
            "priority", "discovered_seq", "status",
        )
        # kept rows are NOT materialized as their own table: they are the
        # survivors the log marks 'kept' (see images_kept()) — one fewer
        # append job per superstep

        # -- politeness clocks: per HOST (re-aggregated across salt buckets)
        fetched_hosts = statused.select("host").distinct()
        hn_new = (
            fetched_hosts.join(F.broadcast(self.robots.select("host", "crawl_delay")), "host", "left")
            .selectExpr(
                "host",
                f"cast({r + 1} + ceil(coalesce(crawl_delay, "
                f"{cfg.default_delay!r})) AS int) AS next_round")
        )
        host_next2 = (
            host_next.unionByName(hn_new).groupBy("host")
            .agg(F.max("next_round").alias("next_round"))
        )

        # -- discoveries: link UDTF (JVM-side pure function) → canon → seen/robots
        targets = link_targets_expr(F.col("image_id"), self.n_corpus)
        links = (
            statused.select("fetch_seq", "priority", F.posexplode(targets).alias("link_pos", "target"))
            .withColumn("t_image_id", F.concat(F.lit("img-"), F.lpad(F.col("target").cast("string"), 8, "0")))
        )
        disc_obs = Observation(f"disc_r{r}")
        disc = links.join(url_map, links.t_image_id == url_map.image_id, "inner").select(
            "fetch_seq", "link_pos", "priority", "canon_url", "host", "path",
            F.xxhash64("canon_url").alias("url_hash"),
        ).observe(disc_obs, F.count(F.lit(1)).alias("n")).persist()

        first = disc.selectExpr(
            "*", "row_number() OVER (PARTITION BY url_hash, canon_url "
                 "ORDER BY fetch_seq, link_pos) AS rn").where("rn = 1").drop("rn")
        seen_tbl = cat.read("seen").select("url_hash", "canon_url")
        new = filter_new_urls(
            first, seen_tbl,
            maybe_udf=self._sketch_udf() if cfg.bloom_prefilter else None)
        new = (
            new.join(F.broadcast(self.robots.select("host", "disallow", "allow")),
                     "host", "left")
            .withColumn(
                "allowed",
                robots_src.allowed_expr(F.col("path"), F.col("disallow"), F.col("allow")),
            ).persist()
        )
        seen_add = new.select("canon_url", "url_hash")
        bands_add = (
            batch_pb.withColumn("kind", F.lit("p"))
            .unionByName(batch_cb.withColumn("kind", F.lit("c")))
        )

        # -- metrics with per-partition (bucket) lineage. The distributed
        # agg runs over the CACHED statused rows (one count_if pass, no
        # pivot); the per-bucket result is tiny (≤ n_buckets rows) so it
        # is collected and appended as a literal frame — two fewer deep
        # write-jobs per superstep.
        _is = lambda s: F.count_if(F.col("status") == s)

        def _collect_and_append_metrics(n_new, n_allowed, n_links):
            # runs inside the parallel write pool: the per-bucket agg is
            # a small job over the CACHED statused rows, and the append
            # is a driver-side literal write — overlaps the table writes
            bucket_rows = (
                statused.groupBy("bucket")
                .agg(F.count("*").alias("fetched"), _is("kept").alias("kept"),
                     _is("dup_exact").alias("dup_exact"),
                     _is("neardup_image").alias("neardup_image"),
                     _is("neardup_caption").alias("neardup_caption"))
                .collect()
            )
            cat.append_local("metrics", _metrics_arrow(
                [(r, int(b["bucket"]), int(b["fetched"]), int(b["kept"]),
                  int(b["dup_exact"]), int(b["neardup_image"]),
                  int(b["neardup_caption"]), 0, 0) for b in bucket_rows]
                + [(r, -1, 0, 0, 0, 0, 0,
                    int(n_new - n_allowed), int(n_links - n_new))],
            ))

        _tb.__exit__()
        # -- overlapped action phase (r4, VERDICT r3 #6; widened r5): of
        # the seven per-round jobs only metrics needs the counting agg's
        # outputs — the SIX table writes (frontier included, now that its
        # sequence buckets use a fixed width instead of n_fetched) depend
        # solely on committed state plus the cached frames. Submit all six
        # immediately and run the counting agg CONCURRENTLY in the main
        # thread: the round's wall cost drops from agg + writes + frontier
        # to ~max(agg, writes). The agg job's scan of `new` still fires
        # both Observations (no dedicated count jobs); cache races between
        # the concurrent jobs are benign (first materialization wins, the
        # rest read it). Snapshot visibility still flips atomically at
        # commit() — staged writes of a zero-fetch round are empty
        # frames (or, for frontier, byte-identical content) that a later
        # commit may include harmlessly.
        def _timed(label, fn, *a):
            if not _PROF:
                return fn(*a)
            import time as _time
            t0 = _time.perf_counter()
            try:
                return fn(*a)
            finally:
                print(f"      [prof] job.{label}: "
                      f"{_time.perf_counter() - t0:.2f}s", flush=True)

        allowed_new = new.filter("allowed")
        # two-phase discovered_seq over (fetch_seq, link_pos): range-
        # buckets of fetch_seq are a monotone coarsening of the
        # discovery order — one round's new links can be billions of
        # rows at frontier scale, so no unpartitioned window here.
        # The bucket WIDTH is a fixed 64 fetch_seqs: with_global_seq's
        # output is independent of the granularity (any width yields the
        # same total order), and a width that needs no n_fetched lets the
        # frontier rewrite launch WITH the other writes instead of
        # serializing behind the counting agg (r5: ~5s/round of wall).
        # At 10^7-fetch rounds that is ~156k offset structs in the packed
        # prefix-sum row (~2.5 MB) — fine; windows stay ≤ 64×fan-out rows.
        fb = 64
        an = with_global_seq(
            allowed_new.withColumn(
                "_fb",
                ((F.col("fetch_seq") - F.lit(int(ctr["next_fetch_seq"]))) / F.lit(fb)).cast("long")),
            ["_fb"], ["fetch_seq", "link_pos"],
            "discovered_seq", start=int(ctr["next_seq"]),
        )
        frontier_add = an.select(
            "canon_url",
            "url_hash",
            "host",
            _bucket(F.col("host"), F.col("canon_url"), cfg).alias("bucket"),
            (F.col("priority") + 1).alias("priority"),
            "discovered_seq",
            F.lit(r + 1).alias("ready_round"),
        )
        frontier2 = (
            frontier.join(batch.select("discovered_seq"), "discovered_seq", "left_anti")
            .unionByName(frontier_add)
        )
        # frontier lands coalesced (content is what matters; at
        # cluster scale the stage would bucket-partition by the
        # salted host hash for co-located reads — locally that extra
        # shuffle per round is pure overhead)
        with _T("round.jobs"), ThreadPoolExecutor(max_workers=8) as ex:
            futs = [
                ex.submit(_timed, "host_next", cat.stage, "host_next", host_next2),
                ex.submit(_timed, "seen", cat.append, "seen", seen_add, 1),
                ex.submit(_timed, "survivors", cat.append, "survivors",
                          batch_surv.select(*SURVIVOR_COLS), 1),
                ex.submit(_timed, "bands", cat.append, "bands", bands_add, 1),
                ex.submit(_timed, "crawl_log", cat.append, "crawl_log", log_add, 1),
                # on a zero-fetch round this rewrites the frontier with
                # byte-identical content (batch and frontier_add are both
                # empty) — a wasted-but-harmless job on a rare round, in
                # exchange for full overlap on every normal one
                ex.submit(_timed, "frontier", cat.stage, "frontier",
                          frontier2, 8),
            ]
            with _T("new.agg"):
                _c = new.agg(F.count("*").alias("n"), F.count_if("allowed").alias("a")).first()
            n_new, n_allowed = int(_c["n"]), int(_c["a"])
            n_links = _obs_val(disc_obs, "n", disc.count)
            n_fetched = _obs_val(fetch_obs, "n", fetched.count)
            if n_fetched == 0:
                for f in futs:
                    f.result()
                for df in (sel, fetched, batch_surv, statused, disc, new):
                    df.unpersist()
                n_frontier = cat.staged_rowcount("frontier")
                return {"fetched": 0, "frontier": n_frontier, "stopped": n_frontier == 0}
            futs.append(ex.submit(_timed, "metrics", _collect_and_append_metrics,
                                  n_new, n_allowed, n_links))
            for f in futs:
                f.result()
        _tc = _T("commit.etc")
        _tc.__enter__()
        cat.commit(r, {
            **ctr,  # carry forward maintenance markers (e.g. last_evicted)
            "next_seq": int(ctr["next_seq"] + n_allowed),
            "next_fetch_seq": int(ctr["next_fetch_seq"] + n_fetched),
            "budget_spent": int(ctr["budget_spent"] + n_fetched),
        })
        if cfg.bloom_prefilter and n_new > 0:
            # fold this round's delta into the sketch (distributed build,
            # driver-side merge — the incremental path at 10^10 scale)
            self._sketch_absorb(seen_add)
        for df in (sel, fetched, batch_surv, statused, disc, new):
            df.unpersist()
        # footer-only count of the just-written frontier — no Spark job
        n_frontier = cat.staged_rowcount("frontier")
        _tc.__exit__()
        return {"fetched": n_fetched, "frontier": n_frontier, "stopped": n_frontier == 0}

    # ------------------------------------------------------- recrawl window
    def evict_cohort(self, cohort_round: int) -> dict:
        """Recrawl-window eviction (north_star: the capability the cuckoo
        backend exists for): forget every URL FETCHED in `cohort_round` —
        delete it from the maintained cuckoo sketch (no rebuild; a Bloom
        bitarray cannot delete, so that backend just drops its sketch and
        rebuilds lazily from the compacted table) and compact it out of
        the seen table (catalog.replace → Iceberg overwrite snapshot).
        Afterward the engine treats those URLs as never seen: later link
        discoveries re-enqueue them with fresh discovered_seq and they
        are re-fetched deterministically. At 10^10 scale the same delete
        runs against per-partition sketches before the driver merge; the
        seen compaction is already fully distributed.

        Publishes a maintenance snapshot at the current round. Returns
        {"evicted": n, "sketch_removed": m}."""
        cohort = (
            self.cat.read("crawl_log")
            .filter(F.col("round") == cohort_round)
            .select("canon_url").distinct()
            .withColumn("url_hash", F.xxhash64("canon_url"))
            .persist()
        )
        n = cohort.count()
        removed = 0
        if n > 0:
            seen2 = self.cat.read("seen").join(
                cohort, ["url_hash", "canon_url"], "left_anti")
            self.cat.replace("seen", seen2, 1)
            if self._sketch is not None:
                if self.cfg.seen_sketch == "cuckoo":
                    # scale-safe targeted delete (VERDICT r3 #3): build
                    # the cohort's OWN cuckoo sketch distributed (per-
                    # partition tables, driver merge — only fixed-size
                    # packed tables cross, never the cohort's ~10^8-row
                    # url_hash list), then vectorized-delete its entries
                    # from the maintained sketch. Exact same net effect
                    # as per-key delete (tests/test_cuckoo.py equivalence)
                    cohort_sk = cuckoo.build_sketch(
                        cohort, self.cfg.cuckoo_buckets)
                    if cohort_sk.overflowed:
                        # pathological kick-order overflow: fall back to
                        # the Bloom-style distributed rebuild from the
                        # compacted seen table — never a wrong sketch
                        self._sketch = None
                    else:
                        removed = self._sketch.delete_sketch(cohort_sk)
                else:
                    self._sketch = None  # Bloom: rebuild from compacted seen
        # commit even when the cohort is empty: the last_evicted marker is
        # what makes recrawl resume-safe (a crash between round commit and
        # eviction must not skip the cohort forever), and an empty-cohort
        # commit is a manifest write only — no Spark job
        ctr = self.cat.counters()
        ctr["last_evicted"] = max(int(ctr.get("last_evicted", -1)), cohort_round)
        self.cat.commit(self.cat.round, ctr)
        cohort.unpersist()
        return {"evicted": n, "sketch_removed": removed}

    def _evict_due(self, through_round: int) -> None:
        """Evict every cohort whose recrawl window has expired as of
        `through_round`, skipping those already marked done — called
        after each round AND once on resume, so a crash between a round's
        commit and its eviction replays the eviction instead of losing
        it (deterministic recrawl across restarts)."""
        last = int(self.cat.counters().get("last_evicted", -1))
        due = through_round - self.cfg.recrawl_window
        for c in range(max(last + 1, 0), due + 1):
            self.evict_cohort(c)

    def _maintain(self, r: int) -> None:
        """Post-commit table maintenance: compact append tables whose
        part count crossed the threshold, then expire old snapshots +
        orphan GC. Both are pure layout/storage operations — table
        contents are unchanged — so a crash between a round's commit and
        its maintenance needs NO resume replay (contrast _evict_due):
        the next trigger round simply compacts a few more parts."""
        cfg = self.cfg
        if cfg.compact_every and (r + 1) % cfg.compact_every == 0:
            did = False
            for name in list(self.cat.manifest["appends"]):
                if len(self.cat.parts(name)) >= cfg.compact_min_parts:
                    # toy scale: one part; a cluster passes a partition
                    # count sized to the Iceberg target file size
                    self.cat.compact(name, partitions=1)
                    did = True
            if did:
                self.cat.commit(self.cat.round, self.cat.counters())
        if cfg.snapshot_keep is not None:
            self.cat.expire_snapshots(cfg.snapshot_keep)

    # ------------------------------------------------------------ derived
    def images_kept(self) -> DataFrame:
        """Kept image+caption rows — a VIEW over committed tables (the
        survivors the crawl log marks 'kept'), not a per-round append:
        the Iceberg twin is a view over the same two tables."""
        kept_seq = (
            self.cat.read("crawl_log")
            .filter(F.col("status") == "kept").select("fetch_seq")
        )
        return (
            self.cat.read("survivors")
            .join(kept_seq, "fetch_seq", "left_semi")
            .select("fetch_seq", "image_id", "caption", "phash", "content_sha")
        )

    # ------------------------------------------------------------------- run
    def run(self) -> dict:
        if not self.cat.exists("frontier"):
            self.init_state()
        start = self.cat.round + 1
        total = 0
        if self.cfg.recrawl_window is not None and start > 0:
            # resume catch-up: evictions due after the last committed
            # round but lost to a crash before they ran
            self._evict_due(start - 1)
        for r in range(start, self.cfg.max_rounds):
            info = self.run_round(r)
            total += info["fetched"]
            if info["stopped"]:
                break
            if self.cfg.recrawl_window is not None:
                self._evict_due(r)
            if self.cfg.compact_every or self.cfg.snapshot_keep is not None:
                self._maintain(r)
        return {"rounds": self.cat.round + 1, "fetched_total": total}
