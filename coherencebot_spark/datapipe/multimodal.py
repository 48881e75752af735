"""Multimodal column processing: image/audio/video as opaque ``binary``
columns with typed metadata, transformed by Arrow-batched UDFs.

The Spark-side plumbing (schemas, batch shapes, partition discipline,
UDF signatures) is real and tested; where a heavyweight codec library
would be required (general JPEG/PNG from the wild, audio, video), the
decode step is stubbed behind ``NotImplementedError`` or a deterministic
fake, clearly marked.  The synthetic payload formats (``png``/``bmp``/
``jpeg``-tagged DCT) decode for real via ``synth.images``.

Scale notes baked into the design:
* bytes stay OUT of shuffles — every transform is a ``mapInPandas`` over
  the scan, never after a ``groupBy``;
* Arrow batch size bounds executor memory: rows ≤
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` and the decode loop
  releases each image before the next (no batch-wide pixel tensor);
* outputs are metadata/features unless pixels are requested, so the
  downstream plan prunes the binary column away.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth import images
from ..synth.phash import phash64

_KNOWN_FMTS = frozenset({"png", "bmp", "jpeg"})


def decode_rgb(data: bytes, fmt: str) -> np.ndarray:
    """Decode payload bytes to (h, w, 3) uint8.

    Synthetic-world formats decode for real; anything else would need a
    codec library that is not in this container."""
    if fmt in _KNOWN_FMTS:
        return images.decode(data, fmt)
    raise NotImplementedError(
        f"decode for format {fmt!r} requires an image codec library "
        "(PIL/libvips) not present in this sandbox — plug one in here."
    )


def with_image_features(content: DataFrame, bytes_col: str = "bytes",
                        fmt_col: str = "fmt") -> DataFrame:
    """Append decoded stats: (dec_w, dec_h, mean_r/g/b, phash64).

    One pass over the scan, per-image numpy, Arrow-batched."""
    cols = list(content.columns)

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = {k: [] for k in
                   ("dec_w", "dec_h", "mean_r", "mean_g", "mean_b", "phash64")}
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                if data is None:
                    for k in out:
                        out[k].append(None)
                    continue
                px = decode_rgb(bytes(data), fmt)
                out["dec_w"].append(px.shape[1])
                out["dec_h"].append(px.shape[0])
                m = px.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(float(m[0]))
                out["mean_g"].append(float(m[1]))
                out["mean_b"].append(float(m[2]))
                out["phash64"].append(phash64(px))
            res = pdf.copy()
            for k, v in out.items():
                res[k] = v
            yield res

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in content.schema) \
        + ", dec_w int, dec_h int, mean_r double, mean_g double, mean_b double, phash64 long"
    return content.mapInPandas(feats, schema=schema)


def with_image_quality_stats(content: DataFrame, bytes_col: str = "bytes",
                             fmt_col: str = "fmt") -> DataFrame:
    """Append decoded-pixel quality statistics:

    * ``px_std``      — grayscale (BT.601 luma) standard deviation;
      solid colors land at 0.
    * ``px_entropy``  — Shannon entropy (bits) of the 64-bin luma
      histogram; a solid color scores 0, rich natural content ~5-6.
    * ``solid_frac``  — fraction of pixels in the modal 12-bit
      (4-bit/channel) quantized RGB color; 1.0 for tracking pixels /
      placeholder blanks, near-1 for single-color banners.
    * ``px_sharpness`` — variance of the 4-neighbor Laplacian of the
      luma plane (the classic blur detector): ~0 for solid colors and
      smooth gradients (heavily blurred / defocused content), large for
      in-focus detail.  Images smaller than 3×3 have no Laplacian
      interior and score 0.0.

    These are the inputs to the junk-image gate
    (:func:`..datapipe.image_corpus.junk_image_gate`): the decoded-pixel
    analog of the text pipeline's Gopher quality heuristics.  One decode
    pass over the scan (mapInPandas, Arrow-batched, per-image release) —
    bytes never reach a shuffle; null payloads yield null stats so a
    gate treats them as junk.
    """
    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            std, ent, solid, sharp = [], [], [], []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                if data is None:
                    std.append(None); ent.append(None)
                    solid.append(None); sharp.append(None)
                    continue
                px = decode_rgb(bytes(data), fmt)
                flat = px.reshape(-1, 3).astype(np.float64)
                luma = flat @ np.array([0.299, 0.587, 0.114])
                std.append(float(luma.std()))
                hist = np.bincount(
                    np.clip(luma, 0, 255).astype(np.int64) >> 2,
                    minlength=64)
                p = hist[hist > 0] / luma.size
                ent.append(float(-(p * np.log2(p)).sum()))
                q = ((flat[:, 0].astype(np.int64) >> 4) << 8) | \
                    ((flat[:, 1].astype(np.int64) >> 4) << 4) | \
                    (flat[:, 2].astype(np.int64) >> 4)
                solid.append(float(np.bincount(q, minlength=4096).max()
                                   / q.size))
                l2 = luma.reshape(px.shape[0], px.shape[1])
                if l2.shape[0] < 3 or l2.shape[1] < 3:
                    sharp.append(0.0)
                else:
                    lap = (4.0 * l2[1:-1, 1:-1] - l2[:-2, 1:-1]
                           - l2[2:, 1:-1] - l2[1:-1, :-2] - l2[1:-1, 2:])
                    sharp.append(float(lap.var()))
            res = pdf.copy()
            res["px_std"], res["px_entropy"], res["solid_frac"] = \
                std, ent, solid
            res["px_sharpness"] = sharp
            yield res

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in content.schema) \
        + (", px_std double, px_entropy double, solid_frac double"
           ", px_sharpness double")
    return content.mapInPandas(stats, schema=schema)


def _bilinear_rgb(px: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Per-channel bilinear resample of an (h, w, 3) uint8 plane to
    (th, tw, 3) — center-aligned sample grid, edge-clamped."""
    ch = []
    for c in range(3):
        g = px[:, :, c].astype(np.float64)
        ys = np.clip((np.arange(th) + 0.5) * g.shape[0] / th - 0.5,
                     0, g.shape[0] - 1)
        xs = np.clip((np.arange(tw) + 0.5) * g.shape[1] / tw - 0.5,
                     0, g.shape[1] - 1)
        y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, g.shape[0] - 1)
        x1 = np.minimum(x0 + 1, g.shape[1] - 1)
        wy, wx = (ys - y0)[:, None], (xs - x0)[None, :]
        top = g[np.ix_(y0, x0)] * (1 - wx) + g[np.ix_(y0, x1)] * wx
        bot = g[np.ix_(y1, x0)] * (1 - wx) + g[np.ix_(y1, x1)] * wx
        ch.append(top * (1 - wy) + bot * wy)
    return np.clip(np.round(np.stack(ch, axis=-1)), 0, 255).astype(np.uint8)


def resize_images(content: DataFrame, target: int = 32,
                  bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Decode → bilinear resize to target×target → re-encode PNG.

    Returns (url?, image_id, resized_png binary)."""
    keep = [c for c in content.columns if c != bytes_col]

    def rs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                if data is None:
                    out.append(None)
                    continue
                px = decode_rgb(bytes(data), fmt)
                out.append(images.encode_png(
                    _bilinear_rgb(px, target, target)))
            res = pdf[keep].copy()
            res["resized_png"] = out
            yield res

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in content.schema if f.name != bytes_col
    ) + ", resized_png binary"
    return content.mapInPandas(rs, schema=schema)


def resize_to_bucket(content: DataFrame,
                     bytes_col: str = "bytes", fmt_col: str = "fmt",
                     w_col: str = "bucket_w",
                     h_col: str = "bucket_h") -> DataFrame:
    """Decode → bilinear resize to each row's OWN target dims (the
    aspect-bucket columns produced by
    :func:`..datapipe.image_corpus.aspect_bucket`) → re-encode PNG —
    the materialization step of aspect-ratio-bucketed training prep:
    after it, every image in a bucket shares exact pixel dims and can
    be stacked into one tensor batch.

    Same Arrow posture as :func:`resize_images` (one map-side pass,
    bytes never shuffle, per-image release); null payloads and null
    targets yield a null output instead of failing the batch."""
    keep = [c for c in content.columns if c != bytes_col]

    def rs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for data, fmt, tw, th in zip(pdf[bytes_col], pdf[fmt_col],
                                         pdf[w_col], pdf[h_col]):
                if data is None or tw is None or th is None:
                    out.append(None)
                    continue
                px = decode_rgb(bytes(data), fmt)
                out.append(images.encode_png(
                    _bilinear_rgb(px, int(th), int(tw))))
            res = pdf[keep].copy()
            res["resized_png"] = out
            yield res

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in content.schema if f.name != bytes_col
    ) + ", resized_png binary"
    return content.mapInPandas(rs, schema=schema)


# ---------------------------------------------------------------------------
# audio / video — plumbing real, decode stubbed
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = ("clip_id string, bytes binary, sample_rate int, n_channels int, "
                "duration_ms long, codec string")
VIDEO_SCHEMA = ("clip_id string, bytes binary, w int, h int, fps float, "
                "n_frames int, codec string")


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """(clip_id, rms, zero_crossings) per clip.

    STUB: real audio decode needs ffmpeg/librosa (absent here).  A clip
    whose codec is 'pcm16' is interpreted as raw little-endian int16 —
    that path is real and tested; all other codecs raise."""

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rms, zc = [], []
            for data, codec in zip(pdf["bytes"], pdf["codec"]):
                if data is None:  # null payload → null features (image
                    rms.append(None)  # path guards the same way)
                    zc.append(None)
                    continue
                if codec != "pcm16":
                    raise NotImplementedError(
                        f"audio codec {codec!r}: decode requires ffmpeg/librosa"
                    )
                x = np.frombuffer(bytes(data), dtype="<i2").astype(np.float64)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                zc.append(int((np.diff(np.signbit(x)) != 0).sum()) if len(x) > 1 else 0)
            yield pd.DataFrame(
                {"clip_id": pdf["clip_id"], "rms": rms, "zero_crossings": zc}
            )

    return audio.mapInPandas(
        feats, schema="clip_id string, rms double, zero_crossings long"
    )


def sample_video_frames(video: DataFrame, every_n: int = 30) -> DataFrame:
    """(clip_id, frame_idx) sampling plan — one row per kept frame.

    The *plan* (which frames to decode, batch shape) is real Spark;
    decoding frames from wild container formats is stubbed — the
    deterministic ``rawrgb`` container decodes for real via
    :func:`extract_video_frames`."""
    # n_frames=0 must sample NOTHING (sequence(0, 0) would claim a
    # phantom frame 0 that extract_video_frames correctly never emits)
    return video.filter(F.col("n_frames") > 0).select(
        "clip_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(int(every_n)))
        ).alias("frame_idx"),
    )


# deterministic video container (the task brief's "deterministic fake"
# with REAL plumbing): 20-byte header + concatenated raw RGB frames —
# frame i lives at a computable offset, so extraction is a frame-accurate
# SEEK, exactly the access pattern a real keyframe-indexed container gives
_VIDEO_HEAD = "<4sIIfI"  # magic, w, h, fps, n_frames


def encode_rawrgb_video(frames: "list[np.ndarray]", fps: float = 30.0) -> bytes:
    import struct

    h, w, _ = frames[0].shape
    head = struct.pack(_VIDEO_HEAD, b"RVID", w, h, float(fps), len(frames))
    return head + b"".join(np.ascontiguousarray(f).tobytes() for f in frames)


def extract_video_frames(video: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame extraction for the ``rawrgb`` codec: seek to each
    sampled frame's byte offset (never materializing the whole clip as
    pixels), emit one row per frame with PNG bytes + channel means.
    Other codecs raise NotImplementedError (ffmpeg absent here) — the
    sampling plan, offset arithmetic, and per-frame emit shape are the
    production plumbing either way."""
    import struct

    head_sz = struct.calcsize(_VIDEO_HEAD)
    step = int(every_n)

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"clip_id": [], "frame_idx": [], "frame_png": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for cid, data, codec in zip(pdf["clip_id"], pdf["bytes"],
                                        pdf["codec"]):
                if codec != "rawrgb":
                    raise NotImplementedError(
                        f"video codec {codec!r}: decode requires ffmpeg"
                    )
                buf = bytes(data)
                magic, w, h, fps, n = struct.unpack_from(_VIDEO_HEAD, buf, 0)
                assert magic == b"RVID", "corrupt rawrgb container"
                fsz = w * h * 3
                for i in range(0, n, step):
                    off = head_sz + i * fsz
                    px = np.frombuffer(buf, dtype=np.uint8, count=fsz,
                                       offset=off).reshape(h, w, 3)
                    m = px.reshape(-1, 3).mean(axis=0)
                    out["clip_id"].append(cid)
                    out["frame_idx"].append(i)
                    out["frame_png"].append(images.encode_png(px))
                    out["mean_r"].append(float(m[0]))
                    out["mean_g"].append(float(m[1]))
                    out["mean_b"].append(float(m[2]))
            yield pd.DataFrame(out)

    return video.select("clip_id", "bytes", "codec").mapInPandas(
        frames,
        schema=("clip_id string, frame_idx int, frame_png binary, "
                "mean_r double, mean_g double, mean_b double"),
    )
