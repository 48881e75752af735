"""URL normalization / filtering / host-domain extraction — vectorized.

Re-expresses the reference's plugin chains as whole-column pandas
operations (SURVEY.md §2.2):

* ``normalize_urls`` — the BasicURLNormalizer rules
  (``urlnormalizer-basic/.../BasicURLNormalizer.java:170-259``): lowercase
  scheme+host, strip default port, strip ``#fragment``, remove trailing
  host dot, resolve ``/./ /../ //`` path segments, canonicalize
  percent-escapes (uppercase hex, decode unreserved).
* ``RegexURLFilter`` — first-match-wins ``+``/``-`` rules
  (``urlfilter-regex/.../RegexURLFilter.java`` via ``lib-regex-filter``).
* ``host_of`` / ``domain_of`` — ``util/URLUtil.java:97,431`` host and
  registered-domain extraction with an embedded public-suffix subset
  (the reference ships ``conf/domain-suffixes.xml``; we bundle the common
  entries needed for the synthetic world + real-world two-level suffixes).

Everything operates on ``pd.Series`` so it can be called inside any pandas
UDF; Spark wrappers are at the bottom.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
    r"(?P<query>\?[^#]*)?(?P<frag>#.*)?$"
)
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# minimal public-suffix subset: multi-level suffixes where the registered
# domain is label3.label2.label1 (everything else: last two labels).
_MULTI_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr",
}

_PCT_UNRESERVED = {
    f"{b:02X}": chr(b)
    for b in range(256)
    if chr(b).isalnum() and b < 128 or chr(b) in "-._~"
}


def _split(url: str):
    m = _URL_RE.match(url)
    if not m:
        return None
    return m.group("scheme"), m.group("auth"), m.group("path"), m.group("query") or ""


def _norm_path(path: str) -> str:
    """Resolve /./, /../, // — ref BasicURLNormalizer.java:223-259."""
    if not path:
        return ""
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if segs:
                segs.pop()
        else:
            segs.append(seg)
    out = "/" + "/".join(segs)
    if path.endswith("/") and not out.endswith("/"):
        out += "/"
    return out


_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _norm_escapes(s: str) -> str:
    """Uppercase percent-escapes; decode unreserved chars
    (BasicURLNormalizer.java:75-123 escape tables)."""

    def sub(m: re.Match) -> str:
        hx = m.group(1).upper()
        return _PCT_UNRESERVED.get(hx, "%" + hx)

    return _PCT_RE.sub(sub, s)


def _normalize_one(url: str) -> str | None:
    parts = _split(url.strip())
    if parts is None:
        return None
    scheme, auth, path, query = parts
    scheme = scheme.lower()
    userinfo, _, hostport = auth.rpartition("@")
    host, colon, port = hostport.partition(":")
    host = host.lower().rstrip(".")
    if not host:
        return None
    if colon and port == _DEFAULT_PORTS.get(scheme):
        colon, port = "", ""
    auth = (userinfo + "@" if userinfo else "") + host + (":" + port if port else "")
    path = _norm_path(path) or "/"
    if "%" in path:
        path = _norm_escapes(path)
    if "%" in query:
        query = _norm_escapes(query)
    return f"{scheme}://{auth}{path}{query}"


def _fast_canonical_mask(s: pd.Series) -> pd.Series:
    """True where the URL is provably already canonical (vectorized).

    Conservative: any suspect construct (explicit port, dot-segment,
    duplicate slash AFTER the scheme separator, trailing host dot, %,
    fragment, userinfo) falls through to the per-string slow path.
    """
    fast = s.str.match(
        r"^(?:http|https|ftp)://[a-z0-9.-]+/[^?#%]*(?:\?[^#%]*)?$",
        na=False,
    )
    # dot-segments (/.), trailing host dot (./ — host is always followed by
    # / in the fast regex), duplicate slash not part of :// ((?<!:)//)
    fast &= ~s.str.contains(r"(?:/\.|\./|(?<!:)//)", regex=True, na=False)
    # any explicit port goes slow-path (default-port stripping)
    fast &= ~s.str.contains(r"^[a-z]+://[^/]*:", regex=True, na=False)
    # leading/trailing whitespace is stripped by the slow path (extracted
    # urls carry it routinely) — found by the fixpoint property test
    fast &= ~s.str.contains(r"^\s|\s$", regex=True, na=False)
    return fast


def normalize_urls(urls: pd.Series) -> pd.Series:
    """Normalize a column of URLs; invalid URLs -> None (filter-rejected).

    Whole-column fast paths: URLs that are already canonical (ascii-lower
    scheme/host, no dot-segments, no %, no fragment, no default port) are
    detected vectorized and skipped; only the residue takes the per-string
    slow path.  On web corpora the fast path covers the large majority of
    rows, keeping the pandas UDF close to pure-vector speed.
    """
    s = urls.astype("string")
    fast = _fast_canonical_mask(s)
    out = s.copy()
    slow_idx = out.index[~fast]
    if len(slow_idx):
        out.loc[slow_idx] = [
            _normalize_one(u) if isinstance(u, str) else None
            for u in s.loc[slow_idx]
        ]
    return out.astype(object).where(pd.notna(out), None)


def host_of(urls: pd.Series) -> pd.Series:
    """Extract lowercased host (ref util/URLUtil.java:431)."""
    return (
        urls.astype("string")
        .str.extract(r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", expand=False)
        .str.lower()
        .str.rstrip(".")
    )


def domain_of(hosts: pd.Series) -> pd.Series:
    """Registered domain of a host column (ref util/URLUtil.java:97)."""
    h = hosts.astype("string").str.lower()
    parts = h.str.split(".")

    def reg_domain(p) -> str | None:
        if not isinstance(p, list):
            return None
        p = list(p)
        if len(p) <= 2:
            return ".".join(p)
        if ".".join(p[-2:]) in _MULTI_SUFFIXES:
            return ".".join(p[-3:])
        return ".".join(p[-2:])

    return parts.map(reg_domain)


_URL_PARTS_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(:\d+)?([^?#]*)(\?[^#]*)?(#.*)?$"
)


def _map_urls(urls: pd.Series, fn) -> pd.Series:
    """Apply a per-string transform; non-matching/None rows pass through."""
    def one(u):
        if not isinstance(u, str):
            return u
        try:
            return fn(u)
        except Exception:
            return u
    return urls.astype(object).map(one)


class PassURLNormalizer:
    """urlnormalizer-pass: identity (the plugin exists so configurations
    can disable normalization per scope without emptying the chain)."""

    def normalize(self, urls: pd.Series) -> pd.Series:
        return urls


class QuerystringURLNormalizer:
    """urlnormalizer-querystring: sort query-string parameters
    alphabetically (QuerystringURLNormalizer.java:50-81) so equivalent
    permutations dedup to one URL."""

    def normalize(self, urls: pd.Series) -> pd.Series:
        def one(u: str) -> str:
            m = _URL_PARTS_RE.match(u)
            if not m or not m.group(5):
                return u
            scheme, host, port, path, query, ref = m.groups()
            parts = sorted(query[1:].split("&"))
            return (f"{scheme}://{host}{port or ''}{path}?"
                    + "&".join(parts) + (ref or ""))
        return _map_urls(urls, one)


class SlashURLNormalizer:
    """urlnormalizer-slash: per-host trailing-slash policy
    (SlashURLNormalizer.java:153-215).  ``rules[host] = True`` adds a
    trailing slash (unless the path appears to end in a file extension —
    a dot within the last 5 chars), ``False`` removes one.  Root paths
    are never touched."""

    def __init__(self, rules: dict[str, bool]):
        self.rules = dict(rules)

    def normalize(self, urls: pd.Series) -> pd.Series:
        rules = self.rules

        def one(u: str) -> str:
            m = _URL_PARTS_RE.match(u)
            if not m:
                return u
            scheme, host, port, path, query, ref = m.groups()
            if host not in rules or len(path) <= 1:
                return u
            rule = rules[host]
            trailing = path.endswith("/")
            if rule and not trailing:
                last_dot = path.rfind(".")
                if len(path) < 6 or last_dot == -1 or last_dot < len(path) - 6:
                    path = path + "/"
            elif not rule and trailing:
                path = path[:-1]
            return f"{scheme}://{host}{port or ''}{path}{query or ''}{ref or ''}"
        return _map_urls(urls, one)


class HostURLNormalizer:
    """urlnormalizer-host: rename hosts to a canonical form from a rules
    map (``src/plugin/urlnormalizer-host``), e.g. ``example.com`` →
    ``www.example.com``."""

    def __init__(self, rules: dict[str, str]):
        self.rules = dict(rules)

    def normalize(self, urls: pd.Series) -> pd.Series:
        rules = self.rules

        def one(u: str) -> str:
            m = _URL_PARTS_RE.match(u)
            if not m or m.group(2) not in rules:
                return u
            scheme, host, port, path, query, ref = m.groups()
            return (f"{scheme}://{rules[host]}{port or ''}{path}"
                    f"{query or ''}{ref or ''}")
        return _map_urls(urls, one)


class ProtocolURLNormalizer:
    """urlnormalizer-protocol: force the protocol for all URLs of a given
    host (``src/plugin/urlnormalizer-protocol``), e.g. every
    ``https://example.org/...`` → ``http://example.org/...``."""

    def __init__(self, rules: dict[str, str]):
        self.rules = dict(rules)

    def normalize(self, urls: pd.Series) -> pd.Series:
        rules = self.rules

        def one(u: str) -> str:
            m = _URL_PARTS_RE.match(u)
            if not m or m.group(2) not in rules:
                return u
            scheme, host, port, path, query, ref = m.groups()
            return (f"{rules[host]}://{host}{port or ''}{path}"
                    f"{query or ''}{ref or ''}")
        return _map_urls(urls, one)


class AjaxURLNormalizer:
    """urlnormalizer-ajax (AjaxURLNormalizer.java:63-225): ``#!`` hashbang
    URLs become their crawlable ``_escaped_fragment_`` form; in the
    indexer scope the transformation reverses.  Fragment escaping matches
    the Java byte loop (control bytes, ``# % & +`` → %XX)."""

    AJAX = "#!"
    ESCAPED = "_escaped_fragment_="

    def __init__(self, scope: str = "default"):
        self.scope = scope

    @staticmethod
    def _escape(frag: str) -> str:
        out = []
        for b in frag.encode("utf-8"):
            if b < 33 or b in (0x23, 0x25, 0x26, 0x2B):
                out.append("%%%02X" % b)
            else:
                out.append(chr(b))
        return "".join(out)

    def normalize(self, urls: pd.Series) -> pd.Series:
        from urllib.parse import unquote

        scope = self.scope

        def one(u: str) -> str:
            if scope == "indexer" and self.ESCAPED in u:
                m = _URL_PARTS_RE.match(u)
                if not m or not m.group(5):
                    return u
                scheme, host, port, path, query, ref = m.groups()
                pairs = [p for p in query[1:].split("&")
                         if not p.startswith(self.ESCAPED)]
                frag = next(p[len(self.ESCAPED):] for p in query[1:].split("&")
                            if p.startswith(self.ESCAPED))
                rest = ("?" + "&".join(pairs)) if pairs else ""
                return (f"{scheme}://{host}{port or ''}{path}{rest}"
                        f"#!{unquote(frag)}")
            if self.AJAX in u:
                pos = u.index(self.AJAX)
                base = u[:pos]
                frag = self._escape(u[pos + 2:])
                sep = "&" if "?" in base else "?"
                return base + sep + self.ESCAPED + frag
            return u
        return _map_urls(urls, one)


class RegexURLNormalizer:
    """urlnormalizer-regex: ordered sed-style substitutions from
    ``regex-normalize.xml`` (``src/plugin/urlnormalizer-regex``).  Default
    rules mirror the template: strip session ids, strip trailing ?, collapse
    duplicate slashes in paths."""

    DEFAULT_RULES = (
        # (pattern, substitution) — conf/regex-normalize.xml.template
        (r"(?i)(;?\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\?|&|#|$)", r"\4"),
        (r"&amp;", "&"),
        (r"\?&", "?"),          # cleanup after removed leading query param
        (r"&{2,}", "&"),
        (r"(\?|&)\s*$", ""),
        (r"(?<!:)/{2,}", "/"),  # duplicate slashes outside the scheme
    )

    def __init__(self, rules: tuple[tuple[str, str], ...] | None = None):
        self.rules = [
            (re.compile(p), s)
            for p, s in (rules if rules is not None else self.DEFAULT_RULES)
        ]

    def normalize(self, urls: pd.Series) -> pd.Series:
        s = urls.astype("string")
        for rx, sub in self.rules:
            s = s.str.replace(rx, sub, regex=True)
        return s


def choose_repr(src: pd.Series, dst: pd.Series, temp: pd.Series) -> pd.Series:
    """Representative URL after a redirect (ref ``util/URLUtil.java:329``,
    used at ``fetcher/FetcherThread.java:577``), vectorized over columns.

    Rules: cross-domain ⇒ dst; permanent: src-root ⇒ src, else dst;
    temporary: src-root & dst-not-root ⇒ src; dst-root & src-not-root ⇒ dst;
    both root ⇒ shortest host; neither root ⇒ same host ? shortest path
    (length, then slash count) : shortest host."""
    src_host = host_of(src)
    dst_host = host_of(dst)
    src_dom = domain_of(src_host)
    dst_dom = domain_of(dst_host)

    def file_part(u: pd.Series) -> pd.Series:
        return u.astype("string").str.replace(
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "", regex=True
        ).fillna("")

    src_file = file_part(src)
    dst_file = file_part(dst)
    src_root = (src_file == "") | (src_file == "/")
    dst_root = (dst_file == "") | (dst_file == "/")
    t = temp.astype(bool)

    shorter_host = src.where(
        src_host.str.len().fillna(1 << 30) <= dst_host.str.len().fillna(0), dst
    )
    path_src_shorter = (
        (src_file.str.len() < dst_file.str.len())
        | ((src_file.str.len() == dst_file.str.len())
           & (src_file.str.count("/") <= dst_file.str.count("/")))
    )
    shorter_path = src.where(path_src_shorter, dst)
    same_host = src_host == dst_host

    out = dst.copy().astype(object)
    cross = (src_dom != dst_dom) | src_dom.isna() | dst_dom.isna()
    perm = ~t
    # permanent: src root → src
    out[(~cross) & perm & src_root] = src[(~cross) & perm & src_root]
    # temp: src root & dst not root → src
    out[(~cross) & t & src_root & ~dst_root] = src[(~cross) & t & src_root & ~dst_root]
    # temp: both root → shortest host
    m = (~cross) & t & src_root & dst_root
    out[m] = shorter_host[m]
    # temp: neither root → same host ? shortest path : shortest host
    m = (~cross) & t & ~src_root & ~dst_root
    out[m & same_host] = shorter_path[m & same_host]
    out[m & ~same_host] = shorter_host[m & ~same_host]
    return pd.Series(out, index=src.index)


# ---------------------------------------------------------------------------
# Filter chain
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RegexRule:
    accept: bool
    pattern: str


class RegexURLFilter:
    """First-match-wins +/- regex filter (urlfilter-regex).

    Rules use the reference's file syntax: lines of ``+regex`` / ``-regex``.
    Default rule set mirrors ``conf/regex-urlfilter.txt.template``: reject
    non-http(s)/ftp protocols, image/binary extensions, and query-string
    loops; accept everything else.
    """

    DEFAULT_RULES = (
        "-^(?:file|ftp|mailto|javascript|data):",
        r"-\.(?:gif|jpg|png|ico|css|sit|eps|wmf|zip|ppt|mpg|gz|rpm|tgz|mov|exe|jpeg|bmp|js)$",
        "-[?*!@=]{3,}",
        r"-.*(/[^/]+)\1\1",  # path-loop heuristic (conf template's repeated-segment rule)
        "+.",
    )

    def __init__(self, rules: tuple[str, ...] | None = None):
        self.rules: list[RegexRule] = []
        for line in rules if rules is not None else self.DEFAULT_RULES:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            self.rules.append(RegexRule(line[0] == "+", line[1:]))
        self._compiled = [(r.accept, re.compile(r.pattern)) for r in self.rules]

    def accept(self, urls: pd.Series) -> pd.Series:
        """Vectorized first-match-wins: one str.contains per rule, applied to
        the shrinking set of still-undecided rows."""
        import warnings

        s = urls.astype("string")
        decided = pd.Series(False, index=s.index)
        verdict = pd.Series(False, index=s.index)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)  # groups in pattern
            for accept, rx in self._compiled:
                if decided.all():
                    break
                undecided = ~decided
                hits = s[undecided].str.contains(rx, regex=True, na=False)
                hit_idx = hits[hits].index
                verdict.loc[hit_idx] = accept
                decided.loc[hit_idx] = True
        # null urls are rejected
        verdict[s.isna()] = False
        return verdict


class PrefixURLFilter:
    """urlfilter-prefix: accept only URLs starting with one of the prefixes."""

    def __init__(self, prefixes: list[str]):
        self.prefixes = tuple(prefixes)

    def accept(self, urls: pd.Series) -> pd.Series:
        return urls.astype("string").str.startswith(self.prefixes, na=False)


class SuffixURLFilter:
    """urlfilter-suffix: REJECT URLs ending with a listed suffix.

    Matches the WHOLE url by default (the reference's
    ``filterFromPath = false``, ``SuffixURLFilter.java:131,152``);
    ``from_path=True`` is the rule-file's ``P`` directive — match the
    PATH only, so ``/big.zip?token=1`` is still rejected and a ``.zip``
    inside the query string is not."""

    def __init__(self, suffixes: list[str], from_path: bool = False):
        self.suffixes = tuple(suffixes)
        self.from_path = from_path

    def accept(self, urls: pd.Series) -> pd.Series:
        s = urls.astype("string").str.lower()
        if self.from_path:
            s = s.str.replace(r"[?#].*$", "", regex=True)
        return ~s.str.endswith(self.suffixes, na=True)


class DomainURLFilter:
    """urlfilter-domain: accept only URLs whose host or registered domain is
    in the allow set.  ``deny=True`` flips it into urlfilter-domaindenylist
    (``DomainDenylistURLFilter.java``): REJECT matching hosts/domains,
    accept everything else — the block-list form used to excise abusive
    domains without touching the allow rules."""

    def __init__(self, domains: list[str], deny: bool = False):
        self.domains = frozenset(d.lower() for d in domains)
        self.deny = deny

    def accept(self, urls: pd.Series) -> pd.Series:
        hosts = host_of(urls)
        doms = domain_of(hosts)
        hit = hosts.isin(self.domains) | doms.isin(self.domains)
        return ~hit if self.deny else hit


def DomainDenylistURLFilter(domains: list[str]) -> DomainURLFilter:
    """urlfilter-domaindenylist (plugin-name alias)."""
    return DomainURLFilter(domains, deny=True)


class DescendantURLFilter:
    """CoherenceBot fork's urlfilter-descendants: restrict the crawl to
    path-descendants of the seed URLs (SURVEY.md §2.2 F2c)."""

    def __init__(self, seed_urls: list[str]):
        # normalize seed prefixes: strip trailing filename, keep dir
        # prefix; a hostname-only seed ('https://example.com') means its
        # ROOT — naive rsplit would degrade it to 'https://', disabling
        # the descendant boundary for the whole scheme
        pref = []
        for u in seed_urls:
            base = u.split("?")[0].split("#")[0]
            sep = base.find("://")
            path_start = base.find("/", sep + 3) if sep != -1 else -1
            if path_start == -1:
                base = base + "/"
            elif not base.endswith("/"):
                base = base.rsplit("/", 1)[0] + "/"
            pref.append(base)
        self.prefixes = tuple(sorted(set(pref)))

    def accept(self, urls: pd.Series) -> pd.Series:
        return urls.astype("string").str.startswith(self.prefixes, na=False)


class PathURLFilter:
    """urlfilter-path: EXCLUDE any URL with a path segment exactly equal to
    a configured path string.

    ``PathURLFilter.java:66-97``: backslashes normalised to ``/`` first,
    the URI path split on ``/``, and each non-empty segment looked up in a
    prefix trie — but the match only counts when ``longestMatch`` has the
    SAME length as the segment, i.e. exact set membership (``/rej`` and
    ``/rejection`` pass a ``reject`` rule, ``/section/reject`` does not).
    Query string and fragment are not part of the path.  Rule lines that
    are empty or start with ``#``/space are skipped (:99-121); URLs the
    URI parser rejects are kept (:92-96 falls through to ``return url``).
    """

    _SCHEME_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"

    def __init__(self, paths: list[str]):
        self.paths = frozenset(
            p for p in paths if p and p[0] not in "# \n")

    def accept(self, urls: pd.Series) -> pd.Series:
        if not self.paths:
            return pd.Series(True, index=urls.index)
        s = urls.astype("string").str.replace("\\", "/", regex=False)
        path = (s.str.replace(self._SCHEME_AUTH, "", regex=True)
                 .str.replace(r"[?#].*$", "", regex=True))
        pset = self.paths
        hit = path.str.split("/").map(
            lambda xs: isinstance(xs, list)
            and any(x in pset for x in xs if x))
        return ~hit.astype(bool)


class AutomatonURLFilter(RegexURLFilter):
    """urlfilter-automaton: same +/- rule files as urlfilter-regex but
    WHOLE-URL match semantics — the reference runs each rule as a DFA over
    the full string (``AutomatonURLFilter.java:100-116``:
    ``automaton.run(url)`` accepts iff the automaton accepts the entire
    url, vs the regex filter's substring ``matcher.find()``).  Rule files
    are written accordingly (``.*`` wrapped — see the plugin's sample
    rules).  dk.brics syntax is plain-regex compatible for the documented
    rule corpus; rules using automaton-only extensions (``<n-m>``
    intervals) are not supported."""

    DEFAULT_RULES = (
        # the plugin's sample/WholeWebCrawling.rules, verbatim semantics
        "-(file|ftp|mailto):.*",
        r"-.*\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|MOV|exe)",
        "-.*[?*!@=].*",
        "+.*",
    )

    def accept(self, urls: pd.Series) -> pd.Series:
        s = urls.astype("string")
        decided = pd.Series(False, index=s.index)
        verdict = pd.Series(False, index=s.index)
        for accept, rx in self._compiled:
            if decided.all():
                break
            undecided = ~decided
            hits = s[undecided].str.fullmatch(rx, na=False)
            hit_idx = hits[hits].index
            verdict.loc[hit_idx] = accept
            decided.loc[hit_idx] = True
        verdict[s.isna()] = False
        return verdict


class ExemptionURLFilter(RegexURLFilter):
    """urlfilter-ignoreexempt (``ignoreexempt/ExemptionUrlFilter.java``):
    decides whether an EXTERNAL outlink is exempt from
    ``db.ignore.external.links``.  Same +/- rule syntax as the regex
    filter, applied to the target url; no matching rule → not exempt
    (the plugin's "If no pattern matches, the URL is ignored").  Default
    rule set is EMPTY — exemptions are always opt-in."""

    DEFAULT_RULES: tuple[str, ...] = ()

    def exempt(self, to_urls: pd.Series) -> pd.Series:
        return self.accept(to_urls)


class ValidatorURLFilter:
    """urlfilter-validator: drop syntactically invalid URLs
    (``urlfilter-validator/.../UrlValidator.java`` — the commons-validator
    RFC 2396 subset).  Ported checks, same order: printable-ASCII only,
    URI-shape split, alpha-only scheme, authority = hostname (atom dots,
    TLD ≥ 2 chars starting alpha, ≥ 2 segments) or IPv4 (octets ≤ 255),
    port ``:\\d{1,5}``, path charset + the ``..`` traversal/slash-count
    rule, any query."""

    _URL = re.compile(r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?$")
    _ASCII = re.compile(r"^[\x21-\x7E]+$")
    _SCHEME = re.compile(r"^[a-zA-Z]+$")
    _AUTHORITY = re.compile(r"^([a-zA-Z\d\-\.]*)(:\d*)?(.*)?$")
    _IPV4 = re.compile(r"^(\d{1,3})[.](\d{1,3})[.](\d{1,3})[.](\d{1,3})$")
    _ATOM = r"[^\s;/@&=,.?:+$]+"
    _DOMAIN = re.compile(rf"^{_ATOM}(\.{_ATOM})*$")
    _PORT = re.compile(r"^:(\d{1,5})$")
    _ALPHA = re.compile(r"^[a-zA-Z]")
    _PATH = re.compile(r"^(/[-\w:@&?=+,.!/~*'%$_;\(\)]*)?$", re.ASCII)

    @classmethod
    def _valid(cls, url: str) -> bool:
        if not url or not cls._ASCII.match(url):
            return False
        m = cls._URL.match(url)
        if not m:
            return False
        scheme, authority, path = m.group(2), m.group(4), m.group(5)
        if scheme is None or not cls._SCHEME.match(scheme):
            return False
        if authority is None:
            return False
        am = cls._AUTHORITY.match(authority)
        if not am:
            return False
        host = am.group(1)
        ip = cls._IPV4.match(host)
        if ip:
            if any(int(ip.group(i)) > 255 for i in range(1, 5)):
                return False
        else:
            if not cls._DOMAIN.match(host):
                return False
            segs = host.split(".")
            top = segs[-1]
            # rightmost label: ≥ 2 chars, starts alpha; need ≥ 2 labels
            if len(top) < 2 or not cls._ALPHA.match(top) or len(segs) < 2:
                return False
        port = am.group(2)
        if port is not None and not cls._PORT.match(port):
            return False
        if (am.group(3) or "").strip():
            return False
        if path is None or not cls._PATH.match(path):
            return False
        # ".." needs enough real slashes around it (UrlValidator:330-346)
        dot2 = path.count("..")
        if dot2 > 0:
            slash2 = path.count("//")
            slash = path.count("/")
            if (slash - slash2 - 1) <= dot2:
                return False
        return True  # query: ^(.*)$ always matches

    def accept(self, urls: pd.Series) -> pd.Series:
        v = self._valid
        return urls.map(lambda u: bool(u is not None and v(str(u))))


class URLFilterChain:
    """Ordered AND of filters (ref net/URLFilters.java: null from any filter
    drops the URL)."""

    def __init__(self, filters: list | None = None):
        self.filters = filters if filters is not None else [RegexURLFilter()]

    def accept(self, urls: pd.Series) -> pd.Series:
        ok = pd.Series(True, index=urls.index)
        for f in self.filters:
            still = ok[ok].index
            if len(still) == 0:
                break
            ok.loc[still] &= f.accept(urls.loc[still])
        return ok


# ---------------------------------------------------------------------------
# Spark wrappers
# ---------------------------------------------------------------------------


def with_normalized_url(df: DataFrame, in_col: str = "url",
                        out_col: str = "url") -> DataFrame:
    """Normalize a URL column via an Arrow-batched pandas UDF."""

    @F.pandas_udf(StringType())
    def _norm(u: pd.Series) -> pd.Series:
        return normalize_urls(u)

    return df.withColumn(out_col, _norm(F.col(in_col)))


def with_filter_accept(df: DataFrame, chain: URLFilterChain | None = None,
                       in_col: str = "url", out_col: str = "accepted") -> DataFrame:
    chain = chain or URLFilterChain()

    @F.pandas_udf(BooleanType())
    def _acc(u: pd.Series) -> pd.Series:
        return chain.accept(u)

    return df.withColumn(out_col, _acc(F.col(in_col)))


def with_host(df: DataFrame, url_col: str = "url", out_col: str = "host") -> DataFrame:
    """host column via built-in parse_url (JVM-side, codegen) with lowercase."""
    return df.withColumn(out_col, F.lower(F.expr(f"parse_url({url_col}, 'HOST')")))


def host_col(url) -> "F.Column":
    """Lowercased host of a url COLUMN as a pure JVM expression (the
    Catalyst twin of :func:`host_of`; ref util/URLUtil.java:431).  Null
    for urls java.net.URL would reject (no scheme://host)."""
    return F.nullif(F.lower(F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1)),
        F.lit(""))


def path_col(url) -> "F.Column":
    """Path component of a url COLUMN (java.net.URL.getPath: no query,
    no fragment, empty string when absent), JVM-side."""
    no_frag = F.split(F.split(url, "#", 2)[0], r"\?", 2)[0]
    return F.regexp_extract(
        no_frag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(/[^?#]*)?", 1)


def domain_col(host) -> "F.Column":
    """Registered domain of a host COLUMN (Catalyst twin of
    :func:`domain_of`; ref util/URLUtil.java:97 with the bundled
    public-suffix subset)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(parts, n - 2, 3))
    return (F.when(n <= 2, host)
            .when(last2.isin(*sorted(_MULTI_SUFFIXES)), last3)
            .otherwise(last2))
