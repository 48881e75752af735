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
                 ignore_tags: tuple[str, ...] = (),
                 include_js: bool = False):
        self.use_form_action = use_form_action
        self.ignore_tags = tuple(ignore_tags)
        # plugin parse-js as an HtmlParseFilter: JS-literal links are
        # PREPENDED to the DOM links (JSParseFilter.java:92-93 appends
        # the original outlinks after the JS finds)
        self.include_js = include_js

    def __call__(self, htmls: pd.Series, urls: pd.Series) -> pd.Series:
        uf, it = self.use_form_action, self.ignore_tags
        rows = []
        for h, u in zip(htmls.fillna(""), urls.fillna("")):
            links = outlinks_from_html(h, u, uf, it)
            if self.include_js:
                links = js_outlinks_from_html(h, u) + links
            rows.append(links)
        return pd.Series(rows, index=htmls.index, dtype=object)


# ---------------------------------------------------------------------------
# JavaScript outlink extraction — plugin parse-js
# (ref parse-js/.../JSParseFilter.java:107-262)
# ---------------------------------------------------------------------------

from urllib.parse import urlsplit  # noqa: E402

# STRING_PATTERN (JSParseFilter.java:195-197): quoted literals without
# whitespace or quotes inside; the backreference closes with the same
# backslash+quote prefix
_JS_STRING = re.compile(r"(\\*(?:\"|'))([^\s\"']+?)(?:\1)", re.I | re.M)
# URI_PATTERN (:199-201) under Matcher.matches() FULL-match semantics;
# the literal can't contain whitespace, so the \s* arms are vestigial
_JS_URI = re.compile(r"(^|\s*?)/?\S+?[/.]\S+($|\s*)", re.I | re.M)
# java.net.URL's built-in protocol handlers — an explicit scheme outside
# this set throws MalformedURLException in the reference (:241-248)
_JAVA_SCHEMES = {"http", "https", "ftp", "file", "mailto", "jar", ""}


def js_links(script: str, base_url: str,
             anchor: str = "") -> list[tuple[str, str]]:
    """getJSLinks (JSParseFilter.java:210-262): scan quoted JS string
    literals, keep full URI_PATTERN matches, prefix ``www.`` candidates
    with ``http://``, resolve the rest against the base URL (urljoin;
    explicit non-java schemes dropped like MalformedURLException), then
    unescape ``&amp;``."""
    out = []
    for m in _JS_STRING.finditer(script or ""):
        url = m.group(2)
        if not _JS_URI.fullmatch(url):
            continue
        if url.startswith("www."):
            url = "http://" + url
        else:
            try:
                resolved = urljoin(base_url, url)
                if urlsplit(url).scheme.lower() not in _JAVA_SCHEMES:
                    continue
                url = resolved
            except ValueError:
                continue
        out.append((url.replace("&amp;", "&"), anchor))
    return out


class _JSCollector(HTMLParser):
    """walk() equivalent (JSParseFilter.java:107-164): JS text from
    <script> bodies, every ``on*`` event-handler attribute, and ``href``
    values containing ``javascript:``."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._script_parts: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            self._script_parts = []
            return
        for k, v in attrs:
            if v is None:
                continue
            if k.startswith("on"):
                self.chunks.append(v)
            elif k == "href" and "javascript:" in v.lower():
                self.chunks.append(v)

    def handle_endtag(self, tag):
        if tag == "script" and self._script_parts is not None:
            self.chunks.append("\n".join(self._script_parts))
            self._script_parts = None

    def handle_data(self, data):
        if self._script_parts is not None and data:
            self._script_parts.append(data)


def js_outlinks_from_html(html: str, page_url: str) -> list[tuple[str, str]]:
    """JS outlinks of an HTML page.  Candidates resolve against the PAGE
    url — the reference's walk() gets ``content.getBaseUrl()``, not the
    page's ``<base href>`` (JSParseFilter.java:86-88)."""
    p = _JSCollector()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        return []
    out = []
    for chunk in p.chunks:
        out.extend(js_links(chunk, page_url))
    return out


class extract_outlinks_js:
    """Vectorized ``outlink_fn`` for pure JavaScript content — the
    plugin's Parser half (``getParse``, JSParseFilter.java:174-193)."""

    needs_base = True

    def __call__(self, scripts: pd.Series, urls: pd.Series) -> pd.Series:
        return pd.Series(
            [js_links(s, u)
             for s, u in zip(scripts.fillna(""), urls.fillna(""))],
            index=scripts.index, dtype=object,
        )
