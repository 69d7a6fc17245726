"""Cuckoo filter properties: exact-absence for inserted keys, bounded
FPR, deletion (the capability Bloom lacks), serialize/merge."""

import numpy as np

from web_crawler_spark.core.cuckoo import CuckooFilter


def _hashes(lo, hi, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**62), 2**62, size=hi - lo, dtype=np.int64)


def test_zero_false_negatives_under_load():
    cf = CuckooFilter(n_buckets=1 << 12)          # capacity 16384 slots
    keys = _hashes(0, 12000)                      # ~73% load
    assert cf.insert(keys) == len(keys)
    assert cf.contains(keys).all()


def test_fpr_bounded():
    cf = CuckooFilter(n_buckets=1 << 12)
    cf.insert(_hashes(0, 12000, seed=1))
    others = _hashes(0, 12000, seed=2)
    fpr = cf.contains(others).mean()
    assert fpr < 0.02  # 16-bit fingerprints, 2 buckets x 4 slots → ~1e-3


def test_delete_then_absent():
    cf = CuckooFilter(n_buckets=1 << 10)
    keys = _hashes(0, 1000)
    cf.insert(keys)
    assert cf.delete(keys[:500]) == 500
    # deleted keys read absent (up to fingerprint collisions with the
    # 500 keys still resident — bound it rather than demand zero)
    assert cf.contains(keys[:500]).mean() < 0.02
    assert cf.contains(keys[500:]).all()  # survivors unaffected


def test_serialize_roundtrip_and_merge_is_union():
    a, b = CuckooFilter(1 << 11), CuckooFilter(1 << 11)
    ka, kb = _hashes(0, 3000, seed=3), _hashes(0, 3000, seed=4)
    a.insert(ka)
    b.insert(kb)
    a2 = CuckooFilter.from_bytes(a.to_bytes(), 1 << 11)
    assert np.array_equal(a2.table, a.table)
    merged = a.merge(b)
    assert merged.contains(ka).all() and merged.contains(kb).all()
