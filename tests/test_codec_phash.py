import numpy as np

from web_crawler_spark.core import imagecodec as ic
from web_crawler_spark.core.phash import hamming64, phash


def _img(seed, w=48, h=48):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_raw_roundtrip_exact():
    px = _img(1)
    assert np.array_equal(ic.decode(ic.encode(px, "raw"), 48, 48, "raw"), px)


def test_q6_roundtrip_psnr_above_floor():
    # the graded per-row invariant: lossy PSNR >= 40 dB (BASELINE.json)
    for seed in range(10):
        px = _img(seed)
        dec = ic.decode(ic.encode(px, "q6"), 48, 48, "q6")
        assert ic.psnr(px, dec) >= 40.0


def test_psnr_detects_corruption():
    px = _img(2).astype(np.int64)
    noisy = np.clip(px + np.random.default_rng(3).integers(-40, 41, px.shape), 0, 255).astype(np.uint8)
    assert ic.psnr(px.astype(np.uint8), noisy) < 40.0


def test_phash_stable_under_lossy_reencode():
    for seed in range(8):
        px = _img(seed)
        dec = ic.decode(ic.encode(px, "q6"), 48, 48, "q6")
        assert hamming64(phash(px), phash(dec)) <= 2


def test_phash_separates_distinct_images():
    dists = [hamming64(phash(_img(i)), phash(_img(i + 100))) for i in range(8)]
    assert min(dists) >= 10  # random images are far apart


def test_phash_nonnegative_63bit():
    for seed in range(5):
        p = phash(_img(seed))
        assert 0 <= p < (1 << 63)


def test_resize_shapes_and_determinism():
    import numpy as np

    from web_crawler_spark.core import imagecodec

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    small = imagecodec.resize(px, 16, 16)
    assert small.shape == (16, 16, 3) and small.dtype == np.uint8
    assert np.array_equal(small, imagecodec.resize(px, 16, 16))
    # identity resize is exact
    assert np.array_equal(imagecodec.resize(px, 64, 48), px)
    # upscale keeps the value set (nearest-neighbor property)
    up = imagecodec.resize(px, 128, 96)
    assert up.shape == (96, 128, 3)
    assert set(np.unique(up)) <= set(np.unique(px))
