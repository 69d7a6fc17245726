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
