"""protocol-file plugin — ``file://`` protocol backend + content reader.

Reference: ``plugin/protocol-file/.../File.java:60-160`` (protocol
dispatch) and ``FileResponse.java:120-310`` (path resolution, directory
listing, headers).

Status semantics (File.getProtocolOutput:109-158):

* 200 file/dir → SUCCESS
* 304 (mtime ≤ datum modified time) → NOTMODIFIED
* 401 unreadable → ACCESS_DENIED
* 404 missing → NOTFOUND
* 3xx (non-canonical path — symlink or relative segment) → MOVED with
  the canonical ``file:`` URI when ``file.crawl.redirect_noncanonical``
  (default true); with the flag off the reference follows the redirect
  in-process up to MAX_REDIRECTS=5, then REDIR_EXCEEDED
* anything else → EXCEPTION

Content semantics (FileResponse:195-310):

* files read whole, silently capped at ``file.content.limit``
  (default 1 MB; -1 = unlimited), mime type detected from the name
  (Tika ⇒ ``mimetypes`` here — extension-based, documented delta from
  byte sniffing);
* directories render as the reference's HTML listing (``list2html``):
  ``Index of <path>`` header, one ``<a href='name[/]'>`` line per child
  with RFC-1123 mtime and size (``-`` for dirs), plus a ``../`` row when
  ``file.crawl.parent`` allows walking up and the dir is not the root.

Spark shape: both halves run as Arrow-batched ``mapInPandas`` stages —
``file_backend`` plugs into :func:`operators.fetch.fetch`'s injectable
``backend`` slot (it sees only the politeness-ordered URL series), and
:func:`read_file_contents` materializes payload bytes AFTER the fetch
log exists, so bytes never cross a shuffle (the same born-late contract
as the synthetic payload path).  Paths must be visible on every executor
(shared mount on a real cluster — the reference reads through the
Hadoop FS API with the same requirement).
"""

from __future__ import annotations

import email.utils
import mimetypes
import os
import urllib.parse

import pandas as pd
from pyspark.sql import DataFrame

from ..status import Proto

__all__ = ["file_backend", "read_file_contents", "list2html",
           "FILE_CONTENT_SCHEMA"]

FILE_CONTENT_SCHEMA = ("url string, bytes binary, content_type string, "
                       "content_length long, last_modified long")


def _path_of(url: str) -> str:
    """file: URL → decoded filesystem path (FileResponse:128-136)."""
    parsed = urllib.parse.urlsplit(url)
    path = parsed.path or "/"
    return urllib.parse.unquote(path)


def _http_date(ts: float) -> str:
    """HttpDateFormat.toString — RFC 1123 GMT."""
    return email.utils.formatdate(ts, usegmt=True)


def file_backend(modified_times: dict[str, int] | None = None,
                 symlinks_as_redirects: bool = True):
    """Injectable ``backend`` for ``fetch()``: urls → proto outcomes.

    ``modified_times``: optional ``{url: epoch_ms}`` of each datum's
    stored modification time — files not newer answer 304/NOTMODIFIED
    (FileResponse:172-177; the crawl driver passes the frontier's
    ``modified_time`` column for refetches)."""
    mods = modified_times or {}

    def backend(urls: pd.Series) -> pd.DataFrame:
        status, redirect = [], []
        for u in urls:
            st, rd = _resolve_one(str(u), mods.get(str(u)),
                                  symlinks_as_redirects)
            status.append(st)
            redirect.append(rd)
        return pd.DataFrame({
            "proto_status": pd.array(status, dtype="int32"),
            "redirect_to": pd.array(redirect, dtype=object),
            "image_idx": pd.array([-1] * len(urls), dtype="int64"),
        })

    return backend


def _resolve_one(url: str, modified_ms: int | None,
                 symlinks_as_redirects: bool) -> tuple[int, str | None]:
    if not url.startswith("file:"):
        return int(Proto.EXCEPTION), None  # Not a file url (FileResponse:124)
    try:
        path = _path_of(url)
        if not os.path.exists(path):
            return int(Proto.NOTFOUND), None
        if not os.access(path, os.R_OK):
            return int(Proto.ACCESS_DENIED), None
        real = os.path.realpath(path)
        # java File.equals(getCanonicalFile()) — the File constructor
        # already drops trailing slashes, so those stay canonical-equal;
        # symlinks and dot segments do not (:157-170).  Compare the RAW
        # path (normalizing it first would collapse the very dot
        # segments the redirect is for).
        bare = path.rstrip("/") or "/"
        if real != bare:
            canonical = "file://" + urllib.parse.quote(real)
            if symlinks_as_redirects:
                return int(Proto.MOVED), canonical
            return int(Proto.REDIR_EXCEEDED), canonical
        if modified_ms is not None \
                and os.path.getmtime(path) * 1000 <= modified_ms:
            return int(Proto.NOTMODIFIED), None
        if os.path.isdir(path) or os.path.isfile(path):
            return int(Proto.SUCCESS), None
        return int(Proto.EXCEPTION), None  # FileError(500) — special file
    except OSError:
        return int(Proto.EXCEPTION), None


def list2html(path: str, include_dotdot: bool) -> bytes:
    """FileResponse.list2html:277-310 — the directory-listing page, byte
    shape preserved (single-quoted hrefs, tab-separated time/size, ``-``
    for directories)."""
    x = ["<html><head>", f"<title>Index of {path}</title></head>\n",
         f"<body><h1>Index of {path}</h1><pre>\n"]
    if include_dotdot:
        x.append("<a href='../'>../</a>\t-\t-\t-\n")
    try:
        names = os.listdir(path)
    except OSError:
        names = []
    for name in names:  # the reference does not sort (:289 "fix me")
        full = os.path.join(path, name)
        try:
            st = os.stat(full)
        except OSError:
            continue
        time = _http_date(st.st_mtime)
        if os.path.isdir(full):
            x.append(f"<a href='{name}/'>{name}/</a>\t{time}\t-\n")
        elif os.path.isfile(full):
            x.append(f"<a href='{name}'>{name}</a>\t{time}\t{st.st_size}\n")
    x.append("</pre></body></html>\n")
    return "".join(x).encode()


def read_file_contents(fetched: DataFrame, url_col: str = "url",
                       max_content_length: int = 1024 * 1024,
                       crawl_parents: bool = True) -> DataFrame:
    """Payload materialization for SUCCESS rows: read each file (capped
    at ``file.content.limit``; -1 = unlimited) or render the directory
    listing.  Returns ``(url, bytes, content_type, content_length,
    last_modified)`` — content_length is the UNCAPPED size header the
    reference sets (:231), last_modified the file mtime in epoch-ms."""

    def read(it):
        for pdf in it:
            out = {k: [] for k in ("url", "bytes", "content_type",
                                   "content_length", "last_modified")}
            for u in pdf[url_col]:
                path = _path_of(str(u))
                blob, ctype, size, mtime = None, "", None, None
                try:
                    st = os.stat(path)
                    mtime = int(st.st_mtime * 1000)
                    if os.path.isdir(path):
                        # file.crawl.parent=false also hides ../ at "/"
                        dotdot = crawl_parents \
                            and os.path.normpath(path) != "/"
                        blob = list2html(path, dotdot)
                        ctype = "text/html"
                        size = len(blob)
                    else:
                        size = st.st_size
                        n = size if max_content_length < 0 \
                            else min(size, max_content_length)
                        with open(path, "rb") as f:
                            blob = f.read(n)
                        ctype = mimetypes.guess_type(path)[0] or ""
                except OSError:
                    pass  # non-success rows yield null payload
                out["url"].append(u)
                out["bytes"].append(blob)
                out["content_type"].append(ctype)
                out["content_length"].append(size)
                out["last_modified"].append(mtime)
            yield pd.DataFrame(out)

    return fetched.select(url_col).mapInPandas(
        read, schema=FILE_CONTENT_SCHEMA)
