"""The deterministic synthetic web (FIXTURES.md §§1-5).

Everything is a pure function of (seed=42, url) — the "web" needs no stored
state, so the fetch simulator works identically at any scale and on any
executor: protocol outcomes, redirect targets, payload bytes, captions and
outlinks are all derived from a vectorized 64-bit FNV-1a hash of the URL.

This module is the *world*, not the engine: engine operators only consume
DataFrames; they never import the generators (the fetch operator takes the
protocol backend as an injectable callable so a real HTTP backend can be
swapped in outside the sandbox).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from functools import lru_cache

from ..status import Proto
from . import images
from .phash import phash64

SEED = 42
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

# ---------------------------------------------------------------------------
# vectorized url hash
# ---------------------------------------------------------------------------


def fnv1a64(s: pd.Series) -> np.ndarray:
    """Vectorized FNV-1a 64 over UTF-8 bytes; returns uint64 ndarray."""
    vals = s.fillna("").astype(str).to_numpy(dtype=object)
    arrs = [np.frombuffer(v.encode("utf-8"), dtype=np.uint8) for v in vals]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    maxlen = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(arrs), max(maxlen, 1)), dtype=np.uint64)
    for i, a in enumerate(arrs):
        if len(a):
            mat[i, : len(a)] = a
    h = np.full(len(arrs), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = j < lens
            nh = (h ^ mat[:, j]) * _FNV_PRIME
            h = np.where(active, nh, h)
    return h


# ---------------------------------------------------------------------------
# payload (image + caption) universe — FIXTURES.md §1
# ---------------------------------------------------------------------------

_WORDS = None


def _words() -> list[str]:
    global _WORDS
    if _WORDS is None:
        rng = np.random.default_rng(SEED)
        cons = list("bcdfghklmnprstvz")
        vow = list("aeiou")
        _WORDS = [
            "".join(
                cons[rng.integers(len(cons))] + vow[rng.integers(len(vow))]
                for _ in range(rng.integers(2, 4))
            )
            for _ in range(256)
        ]
    return _WORDS


DUP_BLOCK = 50  # every 50th payload row duplicates its block head → 2% dups


def payload_effective_index(i: int) -> int:
    return i - (DUP_BLOCK - 1) if i % DUP_BLOCK == DUP_BLOCK - 1 else i


def caption_for(i: int) -> str:
    e = payload_effective_index(i)
    rng = np.random.default_rng(SEED + 7919 * (e + 1))
    n = int(rng.integers(5, 21))
    w = _words()
    # one vectorized draw; numpy's bounded-integer sampling is applied
    # per element in stream order, so this matches the former per-word
    # scalar draws bit-for-bit (asserted in tests)
    picks = rng.integers(len(w), size=n)
    return f"caption {e} " + " ".join(w[int(p)] for p in picks)


def payload_row(i: int) -> dict:
    """One payload row. Pixels/caption key off the *effective* index so
    duplicated rows share phash+caption (dedup fixture), while image_id,
    w/h/fmt stay the row's own."""
    e = payload_effective_index(i)
    w, h, fmt = images.dims_for(e)
    px = images.gen_pixels(e, w, h)
    return {
        "image_id": f"img{i:08d}",
        "bytes": images.encode(px, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(i),
        "phash": phash64(px),
    }


@lru_cache(maxsize=4096)
def _payload_core(e: int) -> tuple[bytes, int, int, str, int, str]:
    """(bytes, w, h, fmt, phash, caption) for EFFECTIVE index e — the
    expensive part of a payload row (pixel gen + codec + DCT phash),
    memoized per worker: duplicate payloads (the 2% dedup fixture) and
    repeated fetches of the same image hit the cache."""
    w, h, fmt = images.dims_for(e)
    px = images.gen_pixels(e, w, h)
    return images.encode(px, fmt), w, h, fmt, phash64(px), caption_for(e)


def payload_rows_batch(idx: np.ndarray) -> pd.DataFrame:
    """Vectorized payload_row over an int64 index array (fetch's
    payload_batch_fn contract): one output row per input index."""
    idx = np.asarray(idx, dtype=np.int64)
    eff = np.where(idx % DUP_BLOCK == DUP_BLOCK - 1, idx - (DUP_BLOCK - 1), idx)
    rows = [_payload_core(int(e)) for e in eff]
    return pd.DataFrame({
        "image_id": [f"img{int(i):08d}" for i in idx],
        "bytes": [r[0] for r in rows],
        "w": np.array([r[1] for r in rows], dtype=np.int32),
        "h": np.array([r[2] for r in rows], dtype=np.int32),
        "fmt": [r[3] for r in rows],
        "caption": [r[5] for r in rows],
        "phash": np.array([r[4] for r in rows], dtype=np.int64),
    })


def validate_payload_rows(pdf: pd.DataFrame) -> np.ndarray:
    """Per-row payload validation (the north rule's invariant): decode the
    fetched bytes, compare decoded pixels to the reference pixels —
    exact equality for lossless formats, PSNR ≥ 40 dB for lossy — and
    require caption equality.  Returns a boolean keep-mask.

    The "reference pixels" are regenerated from the row's image_id (the
    synthetic world is pure), exactly how a real deployment would diff
    against the reference crawler's stored payloads.
    """
    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    ids = pdf["image_id"].to_numpy(dtype=object)
    fmts = pdf["fmt"].to_numpy(dtype=object)
    ws = pdf["w"].to_numpy()
    hs = pdf["h"].to_numpy()
    blobs = pdf["bytes"].to_numpy(dtype=object)
    caps = pdf["caption"].to_numpy(dtype=object)
    for i in range(n):
        try:
            idx = int(str(ids[i])[3:])
            e = payload_effective_index(idx)
            w, h, fmt = int(ws[i]), int(hs[i]), str(fmts[i])
            px = images.decode(bytes(blobs[i]), fmt)
            if px.shape != (h, w, 3):
                continue
            truth = images.gen_pixels(e, w, h)
            if fmt == "jpeg":
                mse = np.mean(
                    (px.astype(np.float64) - truth.astype(np.float64)) ** 2)
                if mse > 0 and 10.0 * np.log10(255.0 ** 2 / mse) < 40.0:
                    continue
            elif not np.array_equal(px, truth):
                continue
            if caps[i] != caption_for(idx):
                continue
            ok[i] = True
        except Exception:
            pass
    return ok


def gen_payload_table(n: int) -> pd.DataFrame:
    rows = [payload_row(i) for i in range(n)]
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    df["phash"] = df["phash"].astype("int64")
    return df


# ---------------------------------------------------------------------------
# URL / host universe
# ---------------------------------------------------------------------------


def host_name(h: int) -> str:
    return f"host{h:04d}.example.org"


def page_url(h: int, p: int) -> str:
    return f"https://{host_name(h)}/page/{p}"


def seed_url(h: int, p: int) -> str:
    return f"https://{host_name(h)}/seed/{p}"


def gen_seed_lines(n: int, n_hosts: int, zipf_a: float = 1.3) -> pd.DataFrame:
    """Seed file lines (FIXTURES.md §2): ~5% blank/comment, ~3% malformed,
    a share with tab-separated k=v metadata; hosts Zipf-distributed."""
    rng = np.random.default_rng(SEED)
    hosts = np.minimum(rng.zipf(zipf_a, size=n) - 1, n_hosts - 1)
    lines: list[str] = []
    for i in range(n):
        r = rng.random()
        if r < 0.03:
            lines.append("" if rng.random() < 0.5 else "# comment line")
            continue
        if r < 0.06:
            lines.append(f"not_a_url_{i}")
            continue
        url = seed_url(int(hosts[i]), i)
        if r < 0.40:
            md = (
                f"\tnutch.score={round(float(rng.random() * 5), 3)}"
                f"\tnutch.fetchInterval={int(rng.integers(3600, 7776000))}"
                f"\tcollection.seed={url}"
            )
            lines.append(url + md)
        else:
            lines.append(url)
    return pd.DataFrame({"line": lines})


# ---------------------------------------------------------------------------
# robots universe — FIXTURES.md §4 (pure function of host index)
# ---------------------------------------------------------------------------


def robots_row(h: int) -> dict:
    rng = np.random.default_rng(SEED + 104729 * (h + 1))
    r = rng.random()
    status = 200 if r < 0.80 else (403 if r < 0.85 else (404 if r < 0.95 else 503))
    disallow = []
    if status == 200 and rng.random() < 0.25:
        disallow = ["/private", "/tmp"][: int(rng.integers(1, 3))]
    r2 = rng.random()
    delay = None
    if r2 < 0.35:
        delay = int(rng.integers(1, 11)) * 1000
    elif r2 < 0.40:
        delay = 45_000  # exceeds fetcher.max.crawl.delay → fetch_gone path
    return {
        "host": host_name(h),
        "robots_status": status,
        "disallow": disallow,
        "crawl_delay_ms": delay,
    }


def gen_robots_table(n_hosts: int) -> pd.DataFrame:
    return pd.DataFrame([robots_row(h) for h in range(n_hosts)])


def robots_for_hosts(hosts: pd.Series) -> pd.DataFrame:
    """Vectorized-ish robots lookup for arbitrary host names: parses the
    host index back out (synthetic hosts are hostNNNN.example.org)."""
    idx = hosts.astype("string").str.extract(r"host(\d+)\.", expand=False)
    rows = []
    for hname, hi in zip(hosts, idx):
        if pd.isna(hi):
            rows.append({"host": hname, "robots_status": 404,
                         "disallow": [], "crawl_delay_ms": None})
        else:
            rows.append(robots_row(int(hi)))
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# synthetic protocol backend — pure function of URL (FIXTURES.md §5)
# ---------------------------------------------------------------------------

# outcome bands over hash%1000
_BANDS = (
    (800, Proto.SUCCESS),
    (880, Proto.NOTFOUND),
    (920, Proto.MOVED),
    (950, Proto.TEMP_MOVED),
    (990, Proto.EXCEPTION),
    (1000, Proto.NOTMODIFIED),
)


def proto_outcomes(urls: pd.Series, n_images: int = 1_000_000,
                   n_hosts: int = 1000) -> pd.DataFrame:
    """Vectorized protocol outcome for a URL column.

    Returns columns: proto_status, redirect_to, image_idx.
    Seeds (path contains /seed/) always succeed so crawls can bootstrap.
    """
    h = fnv1a64(urls)
    band = (h % np.uint64(1000)).astype(np.int64)
    status = np.full(len(urls), Proto.SUCCESS, dtype=np.int64)
    for hi, st in reversed(_BANDS):
        status[band < hi] = st
    is_seed = urls.astype("string").str.contains("/seed/", na=False).to_numpy()
    status[is_seed] = Proto.SUCCESS

    # redirect targets: deterministic; ~1/16 self-redirect (loop case)
    h2 = (h >> np.uint64(17)).astype(np.uint64)
    tgt_host = (h2 % np.uint64(n_hosts)).astype(np.int64)
    tgt_page = ((h2 >> np.uint64(13)) % np.uint64(10_000)).astype(np.int64)
    redirect = np.array(
        [page_url(int(th), int(tp)) for th, tp in zip(tgt_host, tgt_page)],
        dtype=object,
    )
    self_red = (h % np.uint64(16)) == np.uint64(0)
    redirect[self_red] = urls.to_numpy(dtype=object)[self_red]
    moved = np.isin(status, (Proto.MOVED, Proto.TEMP_MOVED))
    redirect[~moved] = None

    image_idx = (h % np.uint64(max(n_images, 1))).astype(np.int64)
    image_idx[status != Proto.SUCCESS] = -1
    return pd.DataFrame(
        {
            "proto_status": status.astype(np.int32),
            "redirect_to": redirect,
            "image_idx": image_idx,
        },
        index=urls.index,
    )


def outlinks_for(urls: pd.Series, n_hosts: int = 1000,
                 max_links: int = 4) -> pd.Series:
    """Deterministic outlinks per URL: 0..max_links links, ~70% same host.

    Returns a Series of list[(to_url, anchor)].  Fully vectorized: link
    hashes, hosts, pages and anchor words are numpy matrices; URL strings
    are built with one pandas str-concat over the flattened links.
    """
    n = len(urls)
    if n == 0:
        return pd.Series([], index=urls.index, dtype=object)
    h = fnv1a64(urls)
    hostidx = (
        urls.astype("string")
        .str.extract(r"host(\d+)\.", expand=False)
        .fillna("0")
        .astype(np.int64)
        .to_numpy()
    )
    n_links = (h % np.uint64(max_links + 1)).astype(np.int64)
    words = np.array(_words(), dtype=object)
    with np.errstate(over="ignore"):
        j = np.arange(1, max_links + 1, dtype=np.uint64)
        g = h[:, None] ^ (np.uint64(0x9E3779B97F4A7C15) * j[None, :])  # (n, L)
    same = (g % np.uint64(10)) < np.uint64(7)
    th = np.where(same, hostidx[:, None], (g % np.uint64(n_hosts)).astype(np.int64))
    tp = ((g >> np.uint64(20)) % np.uint64(10_000)).astype(np.int64)
    valid = np.arange(max_links)[None, :] < n_links[:, None]

    flat_idx = np.nonzero(valid.ravel())[0]
    fth = th.ravel()[flat_idx]
    ftp = tp.ravel()[flat_idx]
    fg = g.ravel()[flat_idx]
    to_urls = (
        "https://host"
        + pd.Series(fth).astype(str).str.zfill(4)
        + ".example.org/page/"
        + pd.Series(ftp).astype(str)
    ).to_numpy(dtype=object)
    anchors = (
        pd.Series(words[(fg % np.uint64(len(words))).astype(np.int64)])
        + " "
        + pd.Series(words[((fg >> np.uint64(8)) % np.uint64(len(words))).astype(np.int64)])
    ).to_numpy(dtype=object)

    pairs = np.empty(len(flat_idx), dtype=object)
    for i in range(len(flat_idx)):
        pairs[i] = (to_urls[i], anchors[i])
    row_of = flat_idx // max_links
    splits = np.searchsorted(row_of, np.arange(1, n))
    out = [list(x) for x in np.split(pairs, splits)]
    return pd.Series(out, index=urls.index)


# ---------------------------------------------------------------------------
# frontier fixture — FIXTURES.md §3
# ---------------------------------------------------------------------------

T0 = 1_700_000_000_000  # fixed epoch-ms origin for all fixtures


def gen_frontier(n: int, n_hosts: int, cycle_time: int = T0) -> pd.DataFrame:
    from ..status import Db

    rng = np.random.default_rng(SEED + 1)
    hosts = np.minimum(rng.zipf(1.3, size=n) - 1, n_hosts - 1)
    status_choices = np.array(
        [Db.UNFETCHED] * 60 + [Db.FETCHED] * 25 + [Db.GONE] * 5
        + [Db.REDIR_TEMP] * 3 + [Db.REDIR_PERM] * 3 + [Db.NOTMODIFIED] * 2
        + [Db.DUPLICATE] + [Db.ORPHAN],
        dtype=np.int64,
    )
    status = status_choices[rng.integers(0, len(status_choices), n)]
    due = rng.random(n) < 0.70
    offs = rng.integers(1, 30 * 86400_000, n)
    fetch_time = np.where(due, cycle_time - offs, cycle_time + offs)
    score = rng.exponential(1.0, n).astype(np.float32)
    score[rng.random(n) < 0.05] = 1.0  # ties for top-N tie-break tests
    urls = [page_url(int(hosts[i]), i) for i in range(n)]
    sigs = [
        bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        if status[i] in (Db.FETCHED, Db.NOTMODIFIED) else None
        for i in range(n)
    ]
    meta: list[dict | None] = []
    for i in range(n):
        m = {}
        if rng.random() < 0.05:
            m["_ngt_"] = str(cycle_time - 1000)
        if rng.random() < 0.10:
            m["collection.seed"] = urls[i]
        meta.append(m or None)
    return pd.DataFrame(
        {
            "url": urls,
            "host": [host_name(int(x)) for x in hosts],
            "status": status.astype(np.int32),
            "fetch_time": fetch_time.astype(np.int64),
            "retries": rng.integers(0, 4, n).astype(np.int32),
            "fetch_interval": np.full(n, 30 * 86400, dtype=np.int64),
            "score": score,
            "signature": sigs,
            "modified_time": np.zeros(n, dtype=np.int64),
            "metadata": meta,
        }
    )
