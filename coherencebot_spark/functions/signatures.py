"""Content signatures (SURVEY.md §2 C3-C5; ref ``crawl/Signature.java``
implementations).

* ``md5_signature`` — MD5 of raw content bytes, URL-bytes fallback
  (``crawl/MD5Signature.java:31-37``) — pure JVM (``F.md5``).
* ``text_md5_signature`` — MD5 of the parse text / caption
  (``crawl/TextMD5Signature.java``) — pure JVM.
* ``TextProfileSignature`` — tokenize → lowercase → frequency-quantize →
  sort (freq desc, token asc) → MD5 (``crawl/TextProfileSignature.java:
  86-160``): robust to small edits.  Per-row string algorithm, so it runs
  as an Arrow-batched pandas UDF (regex tokenization via pandas
  ``str.findall`` keeps the loop out of Python where possible).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)  # letter-or-digit runs
MIN_TOKEN_LEN = 2
QUANT_RATE = 0.01


def md5_signature(bytes_col: Column, url_col: Column) -> Column:
    """MD5 of content, falling back to the URL when content is null."""
    return F.unhex(F.md5(F.coalesce(bytes_col, url_col.cast("binary"))))


def text_md5_signature(text_col: Column) -> Column:
    return F.unhex(F.md5(text_col.cast("binary")))


def text_profile_signature_one(text: str) -> bytes:
    """Reference algorithm, exactly (TextProfileSignature.java:86-160):
    tokens are letter/digit runs lowercased, kept when len > MIN_TOKEN_LEN;
    QUANT = round(maxFreq * rate) clamped (≥2 when maxFreq > 1, else 1);
    counts floored to QUANT multiples, sub-QUANT tokens dropped; profile
    sorted by (freq desc, token asc) and rendered 'token cnt' per line."""
    counts: dict[str, int] = {}
    for tok in _TOKEN_RE.findall(text.lower()):
        if len(tok) > MIN_TOKEN_LEN:
            counts[tok] = counts.get(tok, 0) + 1
    if not counts:
        return hashlib.md5(b"").digest()
    max_freq = max(counts.values())
    quant = round(max_freq * QUANT_RATE)
    if quant < 2:
        quant = 2 if max_freq > 1 else 1
    profile = []
    for tok, cnt in counts.items():
        q = (cnt // quant) * quant
        if q >= quant:
            profile.append((tok, q))
    profile.sort(key=lambda t: (-t[1], t[0]))
    text_out = "\n".join(f"{tok} {cnt}" for tok, cnt in profile)
    return hashlib.md5(text_out.encode("utf-8")).digest()


def text_profile_signature(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(text_profile_signature_one)


def with_text_profile_signature(df: DataFrame, text_col: str = "caption",
                                out_col: str = "signature") -> DataFrame:
    @F.pandas_udf(BinaryType())
    def _sig(t: pd.Series) -> pd.Series:
        return text_profile_signature(t)

    return df.withColumn(out_col, _sig(F.col(text_col)))
