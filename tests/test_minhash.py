import numpy as np

from web_crawler_spark.core import minhash as mh


def _sig(caption):
    h = mh.shingle_hashes(caption)
    return mh.signature_flat(h, np.array([0]))[0]


def test_signature_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "the quick brown fox jumps over the lazy cat near the river bank today"
    est = float((_sig(a) == _sig(b)).mean())
    true = mh.jaccard3(a, b)
    assert abs(est - true) < 0.25  # k=64 → se ≈ sqrt(j(1-j)/64) ≈ 0.06


def test_identical_captions_collide_all_bands():
    a = "spark table row scan hash join sort merge"
    ba, bb = mh.caption_band_hashes([a, a])
    assert (ba == bb).all()


def test_high_jaccard_pairs_share_a_band():
    # θ=0.8, b=16, r=4 → collision prob ≈ 0.9997; over 20 seeded
    # one-word-substitution pairs (the fixture's near-dup class) we demand
    # every pair with true jaccard ≥ 0.8 collides.
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    missed = 0
    checked = 0
    for _ in range(20):
        words = [vocab[j] for j in rng.integers(0, 50, size=12)]
        a = " ".join(words)
        w2 = list(words)
        w2[int(rng.integers(0, 12))] = vocab[int(rng.integers(0, 50))]
        b = " ".join(w2)
        if mh.jaccard3(a, b) >= 0.8:
            checked += 1
            ba, bb = mh.caption_band_hashes([a, b])
            if not (ba == bb).any():
                missed += 1
    assert checked > 0 and missed == 0


def test_low_jaccard_pairs_rarely_collide():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    collisions = 0
    n = 50
    for _ in range(n):
        a = " ".join(vocab[j] for j in rng.integers(0, 500, size=10))
        b = " ".join(vocab[j] for j in rng.integers(0, 500, size=10))
        assert mh.jaccard3(a, b) < 0.2
        ba, bb = mh.caption_band_hashes([a, b])
        collisions += int((ba == bb).any())
    assert collisions <= 2  # P(band collision | j≈0) ≈ 16·j^4 ≈ 0
