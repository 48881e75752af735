"""Plain-text outlink extraction — the OutlinkExtractor port (C7).

The reference extracts URLs from plain text with one hardened regex
(``parse/OutlinkExtractor.java:55-57``) and wraps each match in an
``Outlink(url.trim(), anchor)`` (``:93-117``; the constructor does not
validate — ``Outlink.java:39-45``).  This module reproduces that regex
bit-for-bit as a vectorized pandas path usable as ``parse()``'s
``outlink_fn`` over any text column (captions in the image graft).

Parity notes (all intentional, matching the Java pattern):

* the URL character class INCLUDES ``.,;:!`` — a sentence-final
  ``http://x.org/a.`` keeps its trailing dot (only whitespace is trimmed);
* any scheme of 2+ chars matches (``mailto:``, ``ftp:``...) — scheme
  policy belongs to the URL filter chain, not the extractor;
* relative references never match (no scheme);
* the path part is capped at 333 chars and the fragment at 1001, exactly
  as the Java quantifiers do.
"""

from __future__ import annotations

import re

import pandas as pd

# parse/OutlinkExtractor.java:56-57, groups made non-capturing so
# findall yields the full match (Java matcher.group())
URL_PATTERN = re.compile(
    r"[A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/]"
    r"(?:[A-Za-z0-9$_.+!*,;/?:@&~=-]|%[A-Fa-f0-9]{2}){1,333}"
    r"(?:#[a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000})?"
)


def extract_outlinks_text(texts: pd.Series, anchor: str = "") -> pd.Series:
    """Series[list[(to_url, anchor)]] — the ``outlink_fn`` contract of
    :func:`operators.parse.parse`, whole-column via pandas str.findall."""
    found = texts.fillna("").astype(str).str.findall(URL_PATTERN)
    return found.map(lambda ls: [(u.strip(), anchor) for u in ls])
