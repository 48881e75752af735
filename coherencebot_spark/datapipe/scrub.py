"""PII scrubbing — corpus-hygiene redaction for training pipelines.

Training corpora scrub personally identifiable spans (emails, phone
numbers, IP addresses, ID-like digit runs) before the data reaches a
model; the usual shape is regex redaction with per-category counters so
the pipeline can monitor drift.  (Public practice: the C4 / RefinedWeb /
Dolma pipelines each describe exactly this pass.)

Everything is a Catalyst ``regexp_replace`` / ``regexp_extract_all``
Project over the text scan — no Python in the row path, no shuffle.
Patterns deliberately stay inside the RE2-compatible subset (no
backreferences or lookarounds) so the DuckDB twin can evaluate the SAME
pattern strings and the scrub is under the hard oracle.

Order matters and is fixed: emails are redacted before phones (an email
's digits must not half-match a phone), IPs before phones (dotted quads
contain digit runs).  Counts are taken on the ORIGINAL text.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii", "pii_counts"]

# category -> (RE2-safe pattern, replacement token), applied in order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()./-]{6,14}[0-9]"
              r"|\([0-9]{3}\) ?[0-9]{3}[- ][0-9]{4}"
              r"|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("id_number", r"\b[0-9]{9,16}\b", "<ID>"),
)


def _selected(categories: Sequence[str] | None):
    if categories is None:
        return PII_PATTERNS
    keep = set(categories)
    return tuple(p for p in PII_PATTERNS if p[0] in keep)


def pii_counts(text: Column,
               categories: Sequence[str] | None = None) -> Column:
    """``map<string,int>`` of per-category match counts on the raw text."""
    pats = _selected(categories)
    return F.map_from_arrays(
        F.array(*[F.lit(name) for name, _, _ in pats]),
        F.array(*[F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
                  for _, pat, _ in pats]))


def scrub_pii(df: DataFrame, text_col: str = "text",
              categories: Sequence[str] | None = None,
              out_col: str | None = None,
              counts_col: str | None = "pii_counts") -> DataFrame:
    """Redact the selected categories in ``text_col`` (in the fixed
    PII_PATTERNS order); optionally keep the original under ``out_col``
    naming and the per-category counts."""
    pats = _selected(categories)
    scrubbed = F.col(text_col)
    for _, pat, token in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    out = df
    if counts_col:
        out = out.withColumn(counts_col,
                             pii_counts(F.col(text_col), categories))
    return out.withColumn(out_col or text_col, scrubbed)
