"""Seed-file validator — analogue of the reference's only Python utility
(``src/python/check_seeds.py``): normalize + filter every seed line and
report what would be injected vs. rejected.

Usage: python scripts/check_seeds.py seeds.txt [more.txt ...]
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coherencebot_spark.functions.urls import URLFilterChain, normalize_urls  # noqa: E402


def check(paths: list[str]) -> int:
    lines: list[str] = []
    for p in paths:
        with open(p) as f:
            lines += [l.rstrip("\n") for l in f]
    s = pd.Series(lines)
    stripped = s.str.strip()
    skip = (stripped == "") | stripped.str.startswith("#")
    urls = stripped.str.split("\t").str[0]
    norm = normalize_urls(urls.where(~skip))
    ok = URLFilterChain().accept(norm) & norm.notna()
    n_bad = 0
    for i, line in enumerate(lines):
        if skip.iloc[i]:
            continue
        if not ok.iloc[i]:
            n_bad += 1
            print(f"REJECT line {i + 1}: {line[:120]}")
        elif norm.iloc[i] != urls.iloc[i]:
            print(f"NORMALIZE line {i + 1}: {urls.iloc[i]} -> {norm.iloc[i]}")
    total = int((~skip).sum())
    print(f"{total - n_bad}/{total} seeds valid "
          f"({int(skip.sum())} blank/comment lines)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(check(sys.argv[1:]))
