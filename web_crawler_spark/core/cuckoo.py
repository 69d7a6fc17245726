"""Cuckoo filter over int64 url_hashes — the deletable alternative to
core/bloom.py (north_star: "partitioned Bloom/cuckoo URL-seen filter").

Same prefilter contract as the Bloom sketch (SURVEY.md §4.3): "absent"
is definitive for every inserted key, "present" is a routing hint that
still goes through the exact anti-join. What cuckoo adds over Bloom is
DELETION — at 10^10 scale the seen filter can evict retired URL cohorts
(e.g. recrawl windows) without a full rebuild, which a Bloom bitarray
cannot do.

Layout: B buckets × 4 slots of 16-bit fingerprints (uint16 ndarray;
per-partition tables MERGE by re-inserting fingerprints, and the table
serializes as bytes for broadcast exactly like the Bloom sketch).
Vectorized lookup via numpy; partial-key cuckoo hashing with
alt-bucket = bucket XOR hash(fingerprint), so the bucket pair is
recoverable from (bucket, fingerprint) alone — the property both
deletion and merge rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MULT = np.uint64(0x9E3779B97F4A7C15)
SLOTS = 4
MAX_KICKS = 250


def _fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h * _MULT) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    fph = (fp.astype(np.uint64) * _MULT) >> np.uint64(32)
    return ((b.astype(np.uint64) ^ fph) % np.uint64(n_buckets)).astype(np.int64)


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 14):
        # power-of-two REQUIRED: _alt_bucket's (b ^ hash(fp)) % n_buckets
        # is involutive only when the modulus is a power of two; any other
        # size lets kicked fingerprints drift outside their bucket pair →
        # silent false negatives, which would break the prefilter's
        # exactness contract (a miss must be provably-absent).
        if n_buckets <= 0 or (n_buckets & (n_buckets - 1)) != 0:
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        self.n_items = 0
        # exactness guard: a failed insert at saturation would be a
        # FALSE NEGATIVE (prefilter contract violation). If any insert
        # ever fails, the filter flips to overflowed and contains()
        # returns all-True — pruning degrades to none, exactness holds.
        self.overflowed = False

    # -- single-key ops (kick loop is inherently sequential) ---------------
    def _insert_one(self, b1: int, fp: int, rng: np.random.Generator) -> bool:
        for b in (b1, int(_alt_bucket(np.array([b1]), np.array([fp], np.uint16),
                                      self.n_buckets)[0])):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.n_items += 1
                return True
        # evict: bounded random-walk kicks
        b = b1
        cur = np.uint16(fp)
        for _ in range(MAX_KICKS):
            s = int(rng.integers(0, SLOTS))
            cur, self.table[b, s] = self.table[b, s], cur
            b = int(_alt_bucket(np.array([b]), np.array([cur], np.uint16),
                                self.n_buckets)[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.n_items += 1
                return True
        return False  # table effectively full

    def insert(self, hashes: np.ndarray) -> int:
        """Insert int64/uint64 hashes; returns number inserted (stops
        counting if the table saturates — callers size for load < 0.95)."""
        h = hashes.astype(np.int64, copy=False).view(np.uint64)
        fps = _fingerprint(h)
        b1s = _bucket1(h, self.n_buckets)
        rng = np.random.default_rng(0xC0FFEE)  # deterministic kicks
        ok = 0
        for b1, fp in zip(b1s, fps):
            done = self._insert_one(int(b1), int(fp), rng)
            ok += done
            if not done:
                self.overflowed = True
        return ok

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely
        absent (for every successfully inserted key)."""
        h = hashes.astype(np.int64, copy=False).view(np.uint64)
        if self.overflowed:
            return np.ones(len(h), dtype=bool)
        fps = _fingerprint(h)
        b1 = _bucket1(h, self.n_buckets)
        b2 = _alt_bucket(b1, fps, self.n_buckets)
        f = fps[:, None]
        return ((self.table[b1] == f) | (self.table[b2] == f)).any(axis=1)

    def delete(self, hashes: np.ndarray) -> int:
        """Remove one fingerprint copy per present key (the capability
        Bloom lacks); returns number removed."""
        h = hashes.astype(np.int64, copy=False).view(np.uint64)
        fps = _fingerprint(h)
        b1s = _bucket1(h, self.n_buckets)
        b2s = _alt_bucket(b1s, fps, self.n_buckets)
        removed = 0
        for b1, b2, fp in zip(b1s, b2s, fps):
            for b in (int(b1), int(b2)):
                hit = np.nonzero(self.table[b] == fp)[0]
                if len(hit):
                    self.table[b, hit[0]] = 0
                    self.n_items -= 1
                    removed += 1
                    break
        return removed

    def delete_entries(self, buckets: np.ndarray, fps: np.ndarray) -> int:
        """Vectorized batch delete: remove ONE stored copy per (bucket,
        fingerprint) entry, where each entry's bucket may be either of
        its key's pair (partial-key cuckoo recovers the pair from
        (bucket, fp) alone). Pure numpy — no per-entry Python loop, so
        a 10^8-entry eviction cohort is array passes, not hours.

        Semantics match calling ``delete`` once per original key: both
        group demands by the CANONICAL bucket pair, so copies relocated
        by kicks are found wherever they sit, and k cohort keys sharing
        a (pair, fp) remove exactly k stored copies (all k were
        inserted, so the count balances and no live key loses its
        last copy)."""
        if len(buckets) == 0:
            return 0
        buckets = buckets.astype(np.int64, copy=False)
        fps = fps.astype(np.uint16, copy=False)
        # demand per (canonical pair id, fp): pair id = min of the two
        # buckets, invariant under kick relocation
        dpid = np.minimum(buckets, _alt_bucket(buckets, fps, self.n_buckets))
        dkey = (dpid.astype(np.uint64) << np.uint64(16)) | fps.astype(np.uint64)
        dk, dcnt = np.unique(dkey, return_counts=True)
        # supply: every occupied slot in the table, keyed the same way
        rb, rs = np.nonzero(self.table)
        if len(rb) == 0:
            return 0
        sfp = self.table[rb, rs]
        spid = np.minimum(rb, _alt_bucket(rb.astype(np.int64), sfp, self.n_buckets))
        skey = (spid.astype(np.uint64) << np.uint64(16)) | sfp.astype(np.uint64)
        pos = np.searchsorted(dk, skey)
        pos = np.minimum(pos, len(dk) - 1)
        hit = dk[pos] == skey
        if not hit.any():
            return 0
        skey_h, rb_h, rs_h, di_h = skey[hit], rb[hit], rs[hit], pos[hit]
        # deterministic within-group order (bucket asc, slot asc), then
        # per-group rank; clear the first min(demand, supply) slots
        order = np.lexsort((rs_h, rb_h, skey_h))
        skey_o = skey_h[order]
        starts = np.flatnonzero(np.r_[True, skey_o[1:] != skey_o[:-1]])
        seg_len = np.diff(np.r_[starts, len(skey_o)])
        rank = np.arange(len(skey_o)) - np.repeat(starts, seg_len)
        take = rank < dcnt[di_h[order]]
        bb, ss = rb_h[order][take], rs_h[order][take]
        self.table[bb, ss] = 0
        self.n_items -= len(bb)
        return int(len(bb))

    def delete_sketch(self, other: "CuckooFilter") -> int:
        """Delete every entry of ``other`` (a cohort sketch built
        DISTRIBUTED from the rows to evict) from this filter — the
        scale-safe eviction path: only packed fixed-size tables ever
        reach the driver, never the cohort's rows (VERDICT r3 #3)."""
        if other.n_buckets != self.n_buckets:
            raise ValueError("sketch size mismatch")
        rows, slots = np.nonzero(other.table)
        return self.delete_entries(rows.astype(np.int64), other.table[rows, slots])

    # -- broadcast / merge (mirrors bloom.build_sketch's shape) ------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes() + (b"\x01" if self.overflowed else b"\x00")

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int) -> "CuckooFilter":
        cf = cls(n_buckets)
        cf.table = np.frombuffer(data[:-1], dtype=np.uint16).reshape(n_buckets, SLOTS).copy()
        cf.n_items = int((cf.table != 0).sum())
        cf.overflowed = data[-1] == 1
        return cf

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Merge by re-inserting the other table's fingerprints into their
        canonical buckets (fingerprint+bucket is position-independent
        only up to the b1/b2 pair, which re-insertion preserves)."""
        out = CuckooFilter(self.n_buckets)
        out.table = self.table.copy()
        out.n_items = self.n_items
        out.overflowed = self.overflowed or other.overflowed
        rng = np.random.default_rng(0xC0FFEE)
        rows, slots = np.nonzero(other.table)
        for b, s in zip(rows, slots):
            fp = int(other.table[b, s])
            # other stored fp at b, which is one of its two buckets; insert
            # trying b first keeps the pairing valid (b2 derives from fp+b)
            if not out._insert_one(int(b), fp, rng):
                out.overflowed = True
        return out


# -- distributed build / broadcast lookup (mirrors core/bloom.py) ----------

def build_sketch(hashes_df, n_buckets: int = 1 << 14, n_parts: int = 16) -> "CuckooFilter":
    """Distributed build: per-partition cuckoo tables via applyInPandas,
    merged on the driver by fingerprint re-insertion (only the packed
    tables cross, never rows). Input: DataFrame with int64 `url_hash`."""
    from pyspark.sql import functions as F

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(n_buckets)
        cf.insert(pdf["url_hash"].to_numpy(np.int64))
        return pd.DataFrame({"tbl": [cf.to_bytes()]})

    parts = (
        hashes_df.select("url_hash")
        .withColumn("part", F.pmod(F.col("url_hash"), F.lit(n_parts)))
        .groupBy("part").applyInPandas(build, "tbl binary")
        .collect()
    )
    out = CuckooFilter(n_buckets)
    for row in parts:
        out = out.merge(CuckooFilter.from_bytes(row["tbl"], n_buckets))
    return out


def contains_udf(spark, cf: "CuckooFilter"):
    """pandas_udf(boolean): may the hash be present? False is exact for
    every successfully inserted key (same contract as bloom.contains_udf)."""
    from pyspark.sql import functions as F

    bc = spark.sparkContext.broadcast((cf.to_bytes(), cf.n_buckets))
    cache: dict = {}  # per-worker: rebuild the table once, not per batch

    @F.pandas_udf("boolean")
    def maybe_seen(hashes: pd.Series) -> pd.Series:
        local = cache.get("cf")
        if local is None:
            data, nb = bc.value
            local = cache["cf"] = CuckooFilter.from_bytes(data, nb)
        return pd.Series(local.contains(hashes.to_numpy(np.int64)))

    return maybe_seen
