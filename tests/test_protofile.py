"""protocol-file tests — File.getProtocolOutput's status mapping
(success/notfound/moved/notmodified), FileResponse's directory listing
shape, content cap, and the fetch()-backend integration contract."""

import os

import pandas as pd
import pytest

from coherencebot_spark.sources.protofile import (
    file_backend,
    list2html,
    read_file_contents,
)
from coherencebot_spark.status import Proto


@pytest.fixture()
def tree(tmp_path):
    (tmp_path / "a.txt").write_bytes(b"alpha file")
    (tmp_path / "big.bin").write_bytes(b"x" * 100)
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_bytes(b"beta")
    os.symlink(tmp_path / "a.txt", tmp_path / "link.txt")
    return tmp_path


def _status(tree, rel, **kw):
    url = f"file://{tree}/{rel}" if rel else f"file://{tree}"
    out = file_backend(**kw)(pd.Series([url]))
    return int(out["proto_status"][0]), out["redirect_to"][0]


def test_status_mapping(tree):
    assert _status(tree, "a.txt")[0] == Proto.SUCCESS
    assert _status(tree, "sub")[0] == Proto.SUCCESS  # dir is fetchable
    assert _status(tree, "missing.txt")[0] == Proto.NOTFOUND
    st, _ = _status(tree, "", )  # the root dir itself
    assert st == Proto.SUCCESS


def test_symlink_and_dot_segments_redirect(tree):
    st, loc = _status(tree, "link.txt")
    assert st == Proto.MOVED
    assert loc == f"file://{tree}/a.txt"
    st, loc = _status(tree, "sub/../a.txt")
    assert st == Proto.MOVED and loc.endswith("/a.txt")
    # symlinks_as_redirects=false -> the reference would chase the
    # redirect; the backend surfaces REDIR_EXCEEDED after MAX_REDIRECTS
    st, _ = _status(tree, "link.txt", symlinks_as_redirects=False)
    assert st == Proto.REDIR_EXCEEDED


def test_not_modified(tree):
    url = f"file://{tree}/a.txt"
    future = int(os.path.getmtime(tree / "a.txt") * 1000) + 10_000
    past = int(os.path.getmtime(tree / "a.txt") * 1000) - 10_000
    st = file_backend({url: future})(pd.Series([url]))
    assert int(st["proto_status"][0]) == Proto.NOTMODIFIED
    st = file_backend({url: past})(pd.Series([url]))
    assert int(st["proto_status"][0]) == Proto.SUCCESS


def test_non_file_scheme_is_exception(tree):
    out = file_backend()(pd.Series(["http://h/x"]))
    assert int(out["proto_status"][0]) == Proto.EXCEPTION


def test_read_file_contents(spark, tree):
    urls = [f"file://{tree}/a.txt", f"file://{tree}/big.bin",
            f"file://{tree}"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {r["url"]: r for r in
            read_file_contents(df, max_content_length=10).collect()}
    a = rows[urls[0]]
    assert bytes(a["bytes"]) == b"alpha file"
    assert a["content_type"] == "text/plain"
    assert a["content_length"] == 10
    big = rows[urls[1]]
    # silently capped at file.content.limit, header keeps the real size
    assert len(big["bytes"]) == 10 and big["content_length"] == 100
    d = rows[urls[2]]
    html = bytes(d["bytes"]).decode()
    assert d["content_type"] == "text/html"
    assert f"<title>Index of {tree}</title>" in html
    assert "<a href='sub/'>sub/</a>" in html and "\t-\n" in html
    assert "<a href='a.txt'>a.txt</a>" in html and "\t10\n" in html
    assert "<a href='../'>../</a>" in html  # crawl_parents default


def test_listing_without_parent_walk(tree):
    html = list2html(str(tree), include_dotdot=False).decode()
    assert "../" not in html
    assert html.startswith("<html><head>")
    assert html.endswith("</pre></body></html>\n")


def test_fetch_backend_integration(spark, tree):
    # the backend satisfies fetch()'s ProtocolBackend contract: aligned
    # proto_status/redirect_to/image_idx for a politeness-ordered series
    urls = pd.Series([f"file://{tree}/a.txt", f"file://{tree}/nope",
                      f"file://{tree}/link.txt"])
    out = file_backend()(urls)
    assert list(out.columns) == ["proto_status", "redirect_to", "image_idx"]
    assert len(out) == 3 and (out["image_idx"] == -1).all()
    assert list(out["proto_status"]) == [
        Proto.SUCCESS, Proto.NOTFOUND, Proto.MOVED]
