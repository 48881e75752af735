"""Micro-profile of the synthetic payload path (guide §1: measure first).

Times, single-process, the exact per-row work the bench cycle pays inside
fetch's ``materialize`` stage (payload_rows_batch) and parse's
``validate_payload_rows`` stage, plus a cProfile attribution — so the
optimization targets the measured hot spots, not guesses.

Usage: python scripts/prof_payload.py [N]
"""
from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from coherencebot_spark.synth.world import (  # noqa: E402
    payload_rows_batch, validate_payload_rows, _payload_core)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    # mirror the bench: image_idx = hash % 1M, mostly distinct
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 1_000_000, size=n).astype(np.int64)

    t0 = time.time()
    df = payload_rows_batch(idx)
    t_gen = time.time() - t0
    sizes = df["bytes"].map(len)
    print(f"payload_rows_batch: {n} rows in {t_gen:.2f}s "
          f"({1e3 * t_gen / n:.3f} ms/row), avg {sizes.mean():.0f} B")

    vdf = df.copy()
    t0 = time.time()
    ok = validate_payload_rows(vdf)
    t_val = time.time() - t0
    print(f"validate_payload_rows: {n} rows in {t_val:.2f}s "
          f"({1e3 * t_val / n:.3f} ms/row), ok={ok.mean():.3f}")

    # cProfile attribution on a fresh (uncached) slice
    _payload_core.cache_clear()
    idx2 = rng.integers(1_000_000, 2_000_000, size=min(n, 5000)).astype(np.int64)
    pr = cProfile.Profile()
    pr.enable()
    d2 = payload_rows_batch(idx2)
    validate_payload_rows(d2)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
    print(s.getvalue())


if __name__ == "__main__":
    main()
