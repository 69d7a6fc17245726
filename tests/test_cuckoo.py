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


def test_delete_sketch_equivalent_to_per_key_delete():
    """The scale-safe eviction path (delete a cohort SKETCH, vectorized)
    must leave the table in exactly the state per-key delete would —
    same removal count, identical false-negative guarantees."""
    nb = 1 << 11
    keys = _hashes(0, 6000, seed=5)
    cohort, live = keys[:2500], keys[2500:]

    a = CuckooFilter(nb)
    a.insert(keys)
    b = CuckooFilter.from_bytes(a.to_bytes(), nb)

    ra = a.delete(cohort)
    csk = CuckooFilter(nb)
    csk.insert(cohort)
    rb = b.delete_sketch(csk)
    assert ra == rb == 2500 or ra == rb  # counts always equal
    # live keys still all present in both (exactness contract)
    assert a.contains(live).all() and b.contains(live).all()
    # cohort reads absent up to fp collisions, same small bound both ways
    assert a.contains(cohort).mean() < 0.05
    assert b.contains(cohort).mean() < 0.05
    assert a.n_items == b.n_items


def test_delete_entries_shared_fingerprint_counts_balance():
    """k cohort keys sharing a (pair, fp) with live keys must remove
    exactly k copies — the live copies survive."""
    cf = CuckooFilter(1 << 8)
    # force shared (bucket, fp): insert the same hash value twice via
    # two identical keys (the filter stores one copy per insert)
    h = np.array([123456789, 123456789, 987654321], dtype=np.int64)
    cf.insert(h)
    # delete ONE copy of the duplicated key
    csk = CuckooFilter(1 << 8)
    csk.insert(np.array([123456789], dtype=np.int64))
    assert cf.delete_sketch(csk) == 1
    assert cf.contains(np.array([123456789], dtype=np.int64)).all()  # one copy left
    assert cf.contains(np.array([987654321], dtype=np.int64)).all()


def test_serialize_roundtrip_and_merge_is_union():
    a, b = CuckooFilter(1 << 11), CuckooFilter(1 << 11)
    ka, kb = _hashes(0, 3000, seed=3), _hashes(0, 3000, seed=4)
    a.insert(ka)
    b.insert(kb)
    a2 = CuckooFilter.from_bytes(a.to_bytes(), 1 << 11)
    assert np.array_equal(a2.table, a.table)
    merged = a.merge(b)
    assert merged.contains(ka).all() and merged.contains(kb).all()
