"""Status vocabularies of the crawl state machine.

Mirrors the reference's three-band status byte
(``crawl/CrawlDatum.java:62-107``): DB states persist in the frontier,
FETCH states live in per-cycle fetch logs, and "message" states exist only
as rows flowing between operators within one updatedb (never persisted).

Protocol status codes mirror ``protocol/ProtocolStatus.java:36-75``.
"""

from __future__ import annotations


class Db:
    """Frontier (CrawlDb) statuses — ref crawl/CrawlDatum.java:63-79."""

    UNFETCHED = 0x01
    FETCHED = 0x02
    GONE = 0x03
    REDIR_TEMP = 0x04
    REDIR_PERM = 0x05
    NOTMODIFIED = 0x06
    DUPLICATE = 0x07
    ORPHAN = 0x08
    WITHDRAWN = 0x09  # CoherenceBot fork addition (CrawlDatum.java:78-79)

    ALL = (UNFETCHED, FETCHED, GONE, REDIR_TEMP, REDIR_PERM, NOTMODIFIED,
           DUPLICATE, ORPHAN, WITHDRAWN)
    # statuses purged map-side by CrawlDbFilter when the corresponding
    # db.update.purge.* flags are on (crawl/CrawlDbFilter.java:76-125)
    PURGEABLE = (GONE, ORPHAN, WITHDRAWN)


class Fetch:
    """Per-cycle fetch statuses — ref crawl/CrawlDatum.java:81-93."""

    SUCCESS = 0x21
    RETRY = 0x22
    REDIR_TEMP = 0x23
    REDIR_PERM = 0x24
    GONE = 0x25
    NOTMODIFIED = 0x26

    ALL = (SUCCESS, RETRY, REDIR_TEMP, REDIR_PERM, GONE, NOTMODIFIED)


class Msg:
    """Transient shuffle-message statuses — ref crawl/CrawlDatum.java:100-107.

    These appear as rows in the updatedb input union (signature rows and
    parse-metadata rows emitted by parse; 'linked' rows for discovered
    outlinks; 'injected' for seeds) and are consumed, never stored.
    """

    SIGNATURE = 0x41
    INJECTED = 0x42
    LINKED = 0x43
    PARSE_META = 0x44


class Proto:
    """Protocol-layer outcomes — ref protocol/ProtocolStatus.java:36-75."""

    SUCCESS = 1
    FAILED = 2
    PROTO_NOT_FOUND = 10
    GONE = 11
    MOVED = 12
    TEMP_MOVED = 13
    NOTFOUND = 14
    RETRY = 15
    EXCEPTION = 16
    ACCESS_DENIED = 17
    ROBOTS_DENIED = 18
    REDIR_EXCEEDED = 19
    NOTMODIFIED = 21
    WOULDBLOCK = 22
    BLOCKED = 23


# ProtocolStatus -> fetch status mapping used by the fetch engine's status
# switch (ref fetcher/FetcherThread.java:377-458, SURVEY.md P7).
PROTO_TO_FETCH: dict[int, int] = {
    Proto.SUCCESS: Fetch.SUCCESS,
    Proto.MOVED: Fetch.REDIR_PERM,
    Proto.TEMP_MOVED: Fetch.REDIR_TEMP,
    Proto.EXCEPTION: Fetch.RETRY,
    Proto.RETRY: Fetch.RETRY,
    Proto.WOULDBLOCK: Fetch.RETRY,
    Proto.BLOCKED: Fetch.RETRY,
    Proto.GONE: Fetch.GONE,
    Proto.NOTFOUND: Fetch.GONE,
    Proto.ACCESS_DENIED: Fetch.GONE,
    Proto.ROBOTS_DENIED: Fetch.GONE,
    Proto.REDIR_EXCEEDED: Fetch.GONE,
    Proto.NOTMODIFIED: Fetch.NOTMODIFIED,
}

STATUS_NAMES: dict[int, str] = {
    Db.UNFETCHED: "db_unfetched",
    Db.FETCHED: "db_fetched",
    Db.GONE: "db_gone",
    Db.REDIR_TEMP: "db_redir_temp",
    Db.REDIR_PERM: "db_redir_perm",
    Db.NOTMODIFIED: "db_notmodified",
    Db.DUPLICATE: "db_duplicate",
    Db.ORPHAN: "db_orphan",
    Db.WITHDRAWN: "db_withdrawn",
    Fetch.SUCCESS: "fetch_success",
    Fetch.RETRY: "fetch_retry",
    Fetch.REDIR_TEMP: "fetch_redir_temp",
    Fetch.REDIR_PERM: "fetch_redir_perm",
    Fetch.GONE: "fetch_gone",
    Fetch.NOTMODIFIED: "fetch_notmodified",
    Msg.SIGNATURE: "signature",
    Msg.INJECTED: "injected",
    Msg.LINKED: "linked",
    Msg.PARSE_META: "parse_metadata",
}
