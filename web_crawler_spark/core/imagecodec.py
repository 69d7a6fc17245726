"""Self-contained numpy image codecs + PSNR.

PIL is unavailable in this environment (SURVEY.md §7.3), so the fixture
image formats are defined here, deterministically:

- ``raw``: lossless — uint8 RGB row-major bytes, length w*h*3.
- ``q6``:  lossy — 6-bit per-channel quantization. q = round(v*63/255)
  stored as one byte per sample; decode v' = round(q*255/63).
  Quantization step ≈ 4.05 → MSE ≈ 1.37 → PSNR ≈ 46.9 dB on uniform
  pixel data, comfortably above the graded 40 dB floor
  (BASELINE.json: "decoded-pixel allclose (PSNR≥40dB for lossy)").

All functions are pure numpy and shared by the fixture generator, the
oracle, and the Spark engine's mapInPandas decode step.
"""

from __future__ import annotations

import numpy as np

LOSSY_FMT = "q6"
LOSSLESS_FMT = "raw"


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 → encoded bytes."""
    if fmt == LOSSLESS_FMT:
        return pixels.astype(np.uint8).tobytes()
    if fmt == LOSSY_FMT:
        q = np.rint(pixels.astype(np.float64) * 63.0 / 255.0).astype(np.uint8)
        return q.tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """encoded bytes → (h, w, 3) uint8 pixels."""
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == LOSSLESS_FMT:
        return arr.copy()
    if fmt == LOSSY_FMT:
        return np.rint(arr.astype(np.float64) * 255.0 / 63.0).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images; inf if equal."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def resize(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index math: (h,w,3) uint8 →
    (out_h,out_w,3). Pixel-center sampling (the standard NN convention),
    deterministic — the resize step of the multimodal feature pipeline
    (a production bilinear/Lanczos kernel drops into this signature)."""
    h, w = pixels.shape[0], pixels.shape[1]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[ys[:, None], xs[None, :]]
