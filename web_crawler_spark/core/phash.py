"""Perceptual hash (pHash) — pure numpy, shared by generator/oracle/engine.

Algorithm (SURVEY.md P11; the input_hint's ``phash:int64`` column):
nearest-neighbor resample to 32×32 → luma grayscale → 2-D DCT-II via
precomputed matrix matmul → top-left 8×8 block, DC coefficient dropped →
median threshold → 63-bit hash packed into a non-negative int64.
"""

from __future__ import annotations

import numpy as np

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)

_DCT = _dct_matrix(_N)

_BIT_WEIGHTS = (1 << np.arange(62, -1, -1).astype(np.uint64))


def phash(pixels: np.ndarray) -> int:
    """(h, w, 3) uint8 → signed 63-bit perceptual hash (always ≥ 0)."""
    h, w = pixels.shape[0], pixels.shape[1]
    yi = (np.arange(_N) * h // _N).astype(np.int64)
    xi = (np.arange(_N) * w // _N).astype(np.int64)
    small = pixels[yi][:, xi].astype(np.float64)
    gray = 0.299 * small[:, :, 0] + 0.587 * small[:, :, 1] + 0.114 * small[:, :, 2]
    d = _DCT @ gray @ _DCT.T
    block = d[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    return int((bits * _BIT_WEIGHTS).sum(dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
