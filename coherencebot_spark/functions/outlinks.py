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


# ---------------------------------------------------------------------------
# HTML outlink extraction — the parse-html DOM path
# (ref parse-html/.../DOMContentUtils.java getOutlinks/getBase,
#  util/URLUtil.java resolveURL)
# ---------------------------------------------------------------------------

from html.parser import HTMLParser  # noqa: E402
from urllib.parse import urljoin  # noqa: E402

# tag → link attribute.  CHILDFUL tags carry anchor text (LinkParams
# childLen=1, DOMContentUtils.java:79-91); EMPTY tags link with anchor "".
_CHILDFUL = {"a": "href", "form": "action"}
_EMPTY = {"area": "href", "frame": "src", "iframe": "src",
          "script": "src", "link": "href", "img": "src", "source": "src"}
_WS = re.compile(r"\s+")


class _LinkCollector(HTMLParser):
    """Streaming equivalent of the reference's NodeWalker outlink pass.

    Ports: per-tag link attributes, <base href> before <body>
    (``getBase``, DOMContentUtils.java:280-311), rel=nofollow /
    method=post drops, anchor text of childful tags with img-alt fallback
    (``getOutlinks``, :392-470).  Deliberately NOT ported:
    ``shouldThrowAwayLink`` (:330-376) — it compensates for nekohtml's
    DOM-fixup duplicating nested links, an artifact this stream parser
    doesn't produce (a new <a> implicitly closes an open one, like
    browsers do).  Anchor whitespace is collapsed rather than
    concatenated node-by-node — same trimmed text for well-formed pages.
    """

    def __init__(self, use_form_action: bool = False,
                 ignore_tags: tuple[str, ...] = ()):
        super().__init__(convert_charrefs=True)
        self.childful = dict(_CHILDFUL)
        if not use_form_action:  # parser.html.form.use_action default false
            del self.childful["form"]
        self.empty = dict(_EMPTY)
        for t in ignore_tags:  # parser.html.outlinks.ignore_tags
            self.childful.pop(t, None)
            self.empty.pop(t, None)
        self.base: str | None = None
        self.links: list[tuple[str, str]] = []
        self._in_body = False
        self._open: list | None = None  # [target, text_parts, alt_parts]

    def _flush(self):
        if self._open is None:
            return
        tgt, texts, alts = self._open
        self._open = None
        if tgt is None:
            return
        anchor = _WS.sub(" ", "".join(texts)).strip()
        if not anchor:  # "try harder - use img alt if present"
            anchor = _WS.sub(" ", " ".join(alts)).strip()
        self.links.append((tgt, anchor))

    def handle_starttag(self, tag, attrs):
        a = {}
        for k, v in attrs:  # duplicate attrs: last wins (the Java loop
            a[k] = v        # overwrites target on each match)
        if tag == "body":
            self._in_body = True
        elif tag == "base" and not self._in_body and self.base is None:
            if a.get("href") is not None:
                self.base = a["href"]
        nofollow = (a.get("rel") or "").lower() == "nofollow"
        post = (a.get("method") or "").lower() == "post"
        if tag in self.childful:
            self._flush()  # implicit close of a dangling open link
            self._open = None if (nofollow or post) else [
                a.get(self.childful[tag]), [], []
            ]
        elif tag in self.empty:
            if tag == "img" and self._open is not None:
                alt = (a.get("alt") or "").strip()
                if alt:
                    self._open[2].append(alt)
            tgt = a.get(self.empty[tag])
            if tgt is not None and not nofollow and not post:
                self.links.append((tgt, ""))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag in self.childful:
            self._flush()

    def handle_endtag(self, tag):
        if tag in self.childful:
            self._flush()

    def handle_data(self, data):
        if self._open is not None and data:
            self._open[1].append(data)

    def close(self):
        super().close()
        self._flush()


def outlinks_from_html(html: str, page_url: str,
                       use_form_action: bool = False,
                       ignore_tags: tuple[str, ...] = ()) -> list[tuple[str, str]]:
    """[(absolute_url, anchor)] from one HTML document.

    Base resolution order: explicit <base href> (itself resolved against
    the page URL, as ``new URL(base, href)`` does) else the page URL.
    ``urljoin`` natively implements RFC 3986 §5.4.1 example 7 for pure
    "?query" targets — the case ``URLUtil.resolveURL`` special-cases
    around java.net.URL (``URLUtil.java:42-62``)."""
    p = _LinkCollector(use_form_action, ignore_tags)
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        return []  # unparseable page → no outlinks ("don't care")
    base = urljoin(page_url, p.base.strip()) if p.base else page_url
    out = []
    for tgt, anchor in p.links:
        try:
            u = urljoin(base, tgt.strip())
        except ValueError:
            continue  # MalformedURLException → "don't care"
        if u:
            out.append((u, anchor))
    return out


class extract_outlinks_html:
    """Vectorized ``outlink_fn`` for HTML columns.

    ``parse()`` detects the ``needs_base`` attribute and calls
    ``fn(html_series, url_series)`` so relative links resolve against each
    page's own URL (or its <base href>).  Per-row Python is inherent to
    HTML parsing; the call is Arrow-batched inside parse()'s single
    extraction stage, so nothing extra shuffles."""

    needs_base = True

    def __init__(self, use_form_action: bool = False,
                 ignore_tags: tuple[str, ...] = ()):
        self.use_form_action = use_form_action
        self.ignore_tags = tuple(ignore_tags)

    def __call__(self, htmls: pd.Series, urls: pd.Series) -> pd.Series:
        uf, it = self.use_form_action, self.ignore_tags
        return pd.Series(
            [outlinks_from_html(h, u, uf, it)
             for h, u in zip(htmls.fillna(""), urls.fillna(""))],
            index=htmls.index, dtype=object,
        )
