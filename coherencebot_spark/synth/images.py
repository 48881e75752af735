"""Deterministic pure-numpy image codecs for the synthetic payload world.

The sandbox has no PIL/cv2, so the payload's ``bytes`` column is produced by
three self-contained codecs:

* ``bmp``  — real 24-bit BGR bottom-up BMP (lossless, round-trips exactly).
* ``png``  — real 8-bit RGB PNG, filter 0, zlib (lossless; readable by any
  PNG decoder).
* ``jpeg`` — a deterministic lossy 8×8 block-DCT codec with uniform
  quantization (our own container, JPEG-like in spirit).  It exists to
  exercise the lossy per-row invariant from BASELINE.json input_hint:
  decoded-pixel PSNR ≥ 40 dB vs the source pixels.  Uniform q=6 gives
  coefficient-domain RMSE ≈ q/√12 ≈ 1.73 → PSNR ≈ 43 dB.

All functions are pure (seeded) — no wall clock, no randomness beyond the
row-derived rng.  (FIXTURES.md §1.)
"""

from __future__ import annotations

import struct
import zlib
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# pixel generation
# ---------------------------------------------------------------------------

WIDTHS = (32, 64, 96, 128)
HEIGHTS = (32, 48, 64, 128)
FMTS = ("png", "jpeg", "bmp")
SEED = 42


def dims_for(i: int) -> tuple[int, int, str]:
    return WIDTHS[i % 4], HEIGHTS[(i // 4) % 4], FMTS[i % 3]


def gen_pixels(i: int, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Deterministic RGB uint8 field for payload row i (FIXTURES.md §1)."""
    if w is None or h is None:
        w, h, _ = dims_for(i)
    rng = np.random.default_rng(SEED + i)
    # smooth low-frequency field + noise: more realistic spectra than pure
    # noise, and gives the lossy codec something compressible.
    base = rng.integers(0, 256, size=(h // 8 + 1, w // 8 + 1, 3), dtype=np.uint8)
    # 8x block upsample; value-identical to np.kron(base, ones((8,8,1)))
    # but ~3x faster (kron builds the product via an outer multiply)
    up = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w, :]
    noise = rng.integers(-24, 25, size=(h, w, 3), dtype=np.int16)
    return np.clip(up.astype(np.int16) + noise, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# BMP (24-bit, bottom-up, BGR)
# ---------------------------------------------------------------------------


def encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body_size = (row + pad) * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + body_size, 0, 0, 54,
        40, w, h, 1, 24, 0, body_size, 2835, 2835, 0, 0,
    )
    bgr = px[::-1, :, ::-1]  # bottom-up, BGR
    if pad:
        rows = np.zeros((h, row + pad), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    off, = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    row = w * 3
    stride = row + ((-row) % 4)
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    arr = arr.reshape(h, stride)[:, :row].reshape(h, w, 3)
    return arr[::-1, :, ::-1].copy()


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, filter 0)
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack_from(">II", payload, 0)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# lossy DCT codec ("jpeg" tag)
# ---------------------------------------------------------------------------

_Q = 6.0  # uniform quantization step → PSNR ≈ 43 dB


@lru_cache(maxsize=1)
def _dct_matrix() -> np.ndarray:
    n = 8
    k = np.arange(n)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    m[0, :] = 1 / np.sqrt(2)
    return (m * np.sqrt(2 / n)).astype(np.float64)


def _blockify(px: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h,w,3) uint8 → (nblocks, 8, 8, 3) float, edge-padded to 8-multiples."""
    h, w, _ = px.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw), (0, 0)), mode="edge")
    H, W = px.shape[:2]
    b = px.reshape(H // 8, 8, W // 8, 8, 3).transpose(0, 2, 1, 3, 4)
    return b.reshape(-1, 8, 8, 3).astype(np.float64) - 128.0, H, W


def encode_lossy(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    blocks, H, W = _blockify(px)
    d = _dct_matrix()
    # per-channel 2D DCT: D @ B @ D.T, batched.  Two broadcast matmuls
    # instead of one 3-operand einsum — c_einsum has no BLAS path and was
    # the single hottest call of the payload pipeline (guide §4.2).
    bt = blocks.transpose(0, 3, 1, 2)          # (b, c, 8, 8)
    coef = ((d @ bt) @ d.T).transpose(0, 2, 3, 1)
    q = np.round(coef / _Q).astype(np.int16)
    payload = zlib.compress(q.tobytes(), 6)
    header = struct.pack("<4sHHHH", b"LDCT", w, h, W, H)
    return header + payload


def decode_lossy(data: bytes) -> np.ndarray:
    tag, w, h, W, H = struct.unpack_from("<4sHHHH", data, 0)
    assert tag == b"LDCT"
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)
    nb = (H // 8) * (W // 8)
    coef = q.reshape(nb, 8, 8, 3).astype(np.float64) * _Q
    d = _dct_matrix()
    # inverse 2D DCT as two broadcast matmuls (see encode_lossy)
    ct = coef.transpose(0, 3, 1, 2)            # (b, c, 8, 8)
    blocks = ((d.T @ ct) @ d).transpose(0, 2, 3, 1) + 128.0
    px = blocks.reshape(H // 8, W // 8, 8, 8, 3).transpose(0, 2, 1, 3, 4)
    px = px.reshape(H, W, 3)
    return np.clip(np.round(px), 0, 255).astype(np.uint8)[:h, :w, :]


# ---------------------------------------------------------------------------
# dispatch + metrics
# ---------------------------------------------------------------------------

_ENC = {"bmp": encode_bmp, "png": encode_png, "jpeg": encode_lossy}
_DEC = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_lossy}
LOSSY = frozenset({"jpeg"})


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENC[fmt](px)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DEC[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(255.0) - 10 * np.log10(mse))
