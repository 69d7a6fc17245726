"""Crawl configuration shared by the Spark engine and the oracle."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class CrawlConfig:
    per_host_k: int = 2          # politeness budget: max fetches per host per round
    max_rounds: int = 50
    global_budget: int | None = None
    default_delay: float = 1.0   # rounds, for hosts without a robots entry
    phash_max_hamming: int = 2
    psnr_floor: float = 40.0
    jaccard_theta: float = 0.8
    n_buckets: int = 64          # salted host-hash frontier buckets (≫ at cluster scale)
    n_salts: int = 256           # salt fan-out per host against hot-domain skew;
                                 # ~4× n_buckets keeps max/mean bucket load ≤ 2 on
                                 # Zipf(1.1) hosts (tests/test_skew.py property)
    bloom_prefilter: bool = False  # broadcast Bloom routes provably-new URLs
                                   # around the exact seen anti-join (north_star
                                   # sketch; results identical on/off —
                                   # tests/test_bloom_crawl.py). Costs ~2 extra
                                   # jobs/round, so off at toy scale, on at 10^10
    bloom_bits: int = 1 << 20    # sketch size; ~10 bits/URL keeps FPR < 1%
    seen_sketch: str = "bloom"   # "bloom" | "cuckoo" — cuckoo adds deletion
                                 # (recrawl-window eviction) at the same
                                 # prefilter-exactness contract
    recrawl_window: int | None = None  # if set, after round r the cohort
                                       # fetched at round r-window is
                                       # EVICTED from the seen set
                                       # (cuckoo sketch deletion + seen
                                       # compaction) so later link
                                       # discoveries re-enqueue it —
                                       # the recrawl semantics the
                                       # cuckoo backend exists for
    cuckoo_buckets: int = 1 << 15  # ×4 slots; size for load < 0.9.
                                   # MUST be a power of two (cuckoo
                                   # alt-bucket XOR involution; enforced
                                   # in CuckooFilter.__init__)
    compact_every: int | None = None  # every k rounds, small-file-compact
                                      # append tables (Iceberg
                                      # rewrite_data_files) — at 10^5
                                      # rounds an uncompacted log is 10^5
                                      # dirs and listing dominates reads
    compact_min_parts: int = 8     # only tables at/above this part count
    priority_mode: str = "bfs"   # "bfs" (default: order by depth then
                                 # discovery) | "authority": round r
                                 # orders the batch by host-level
                                 # PageRank computed from rounds < r
                                 # (the classic upgrade over BFS
                                 # priority — fetch pages on
                                 # well-linked hosts first). Within a
                                 # host the (priority, discovered_seq)
                                 # order and the per-host politeness
                                 # budget are unchanged; ranks quantize
                                 # to round(rank*1e6) so the engine and
                                 # the sequential oracle order
                                 # identically despite distributed-vs-
                                 # sequential float summation
    authority_iters: int = 10    # PageRank power-iteration rounds
    authority_damping: float = 0.85
    authority_refresh_every: int = 1  # recompute host rank every k
                                      # rounds; between refreshes round
                                      # r uses the rank as of round
                                      # r - (r % k), derived purely from
                                      # the committed log so the choice
                                      # is deterministic AND resume-safe
                                      # (a restarted engine recomputes
                                      # the same rank for the same
                                      # round). k=1 is the per-round
                                      # recompute (default, unchanged);
                                      # larger k amortizes the per-round
                                      # PageRank job at the cost of
                                      # staler priorities
    snapshot_keep: int | None = None  # retain only the newest K per-round
                                      # snapshots (Iceberg
                                      # expire_snapshots + orphan GC);
                                      # None = retain all (full time
                                      # travel, unbounded storage)
