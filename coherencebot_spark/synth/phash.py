"""64-bit DCT perceptual hash (deterministic, pure numpy).

Classic pHash: grayscale → resize 32×32 (bilinear) → 2D DCT → top-left 8×8
low-frequency block → threshold against the median (DC excluded from the
median) → 64 bits packed row-major into a signed int64 (input_hint:
``phash:int64``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1)
def _dct32() -> np.ndarray:
    n = 32
    k = np.arange(n)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    m[0, :] = 1 / np.sqrt(2)
    return (m * np.sqrt(2 / n)).astype(np.float64)


def _resize32(gray: np.ndarray) -> np.ndarray:
    """Bilinear resize to 32×32 (deterministic, no deps)."""
    h, w = gray.shape
    ys = (np.arange(32) + 0.5) * h / 32 - 0.5
    xs = (np.arange(32) + 0.5) * w / 32 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    g = gray.astype(np.float64)
    top = g[np.ix_(y0, x0)] * (1 - wx) + g[np.ix_(y0, x1)] * wx
    bot = g[np.ix_(y1, x0)] * (1 - wx) + g[np.ix_(y1, x1)] * wx
    return top * (1 - wy) + bot * wy


def phash64(px: np.ndarray) -> int:
    """Perceptual hash of an (h, w, 3) uint8 RGB array → signed int64."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize32(gray)
    d = _dct32()
    coef = d @ small @ d.T
    block = coef[:8, :8].copy()
    med = np.median(np.concatenate([block.ravel()[1:]]))  # exclude DC
    bits = (block.ravel() > med).astype(np.uint8)
    # pack row-major, first bit = MSB — same value the former
    # shift-or loop produced, without 64 Python-level iterations
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
