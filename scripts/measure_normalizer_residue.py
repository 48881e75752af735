"""Measure the URL-normalizer fast-path hit rate on the synthetic outlink
corpus (VERDICT r3 #7: if the per-string residue exceeds a few percent,
the top slow-path rules should be vectorized).

Driver-side pandas only — the measurement exercises exactly the mask the
pandas UDF applies per Arrow batch (``functions.urls._fast_canonical_mask``).

Usage: python scripts/measure_normalizer_residue.py [n_pages]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coherencebot_spark.functions.urls import _fast_canonical_mask, normalize_urls
from coherencebot_spark.synth import world


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_hosts = 1000

    # page urls the synthetic web serves, same shape the crawl generates
    h = np.arange(n_pages) % n_hosts
    pages = pd.Series(
        [f"https://host{int(x):04d}.example.org/page/{i}"
         for i, x in enumerate(h)]
    )
    links = world.outlinks_for(pages, n_hosts=n_hosts)
    targets = pd.Series(
        [t for row in links for (t, _a) in (row if isinstance(row, list) else [])]
    )
    corpus = pd.concat([pages, targets], ignore_index=True)

    t0 = time.time()
    fast = _fast_canonical_mask(corpus.astype("string"))
    mask_s = time.time() - t0
    residue = int((~fast).sum())

    t0 = time.time()
    normalize_urls(corpus)
    norm_s = time.time() - t0

    print({
        "corpus_rows": int(len(corpus)),
        "outlink_rows": int(len(targets)),
        "fast_path_rows": int(fast.sum()),
        "slow_residue_rows": residue,
        "slow_residue_pct": round(100.0 * residue / len(corpus), 4),
        "mask_sec": round(mask_s, 3),
        "normalize_sec_total": round(norm_s, 3),
        "urls_per_sec": round(len(corpus) / norm_s, 0),
    })


if __name__ == "__main__":
    main()
