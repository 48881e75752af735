"""parse-ext tests — TestExtParser's cat/md5sum alternation plus the
no-command / truncation / nonzero-exit / timeout failure paths and the
OutlinkExtractor pass over the command output."""

import hashlib
import os
import stat

import pytest

# mirror of the reference's sample dispatcher (plugin/parse-ext/command):
# receives the mimeType as $1, cats or md5sums stdin
_DISPATCH = """#!/bin/bash
set -e
case $1 in
"application/vnd.nutch.example.cat") cat ;;
"application/vnd.nutch.example.md5sum") md5sum ;;
*) echo "Can't parse mimeType $1" >&2; exit 1 ;;
esac
"""


@pytest.fixture(scope="module")
def dispatcher(tmp_path_factory):
    p = tmp_path_factory.mktemp("parseext") / "command"
    p.write_text(_DISPATCH)
    os.chmod(p, os.stat(p).st_mode | stat.S_IXUSR | stat.S_IXGRP
             | stat.S_IXOTH)
    return str(p)


def _run(spark, rows, type_params, declared=False):
    from coherencebot_spark.operators.parseext import parse_ext

    schema = "url string, bytes binary, content_type string" + (
        ", content_length long" if declared else "")
    df = spark.createDataFrame(rows, schema)
    out = parse_ext(df, type_params,
                    declared_len_col="content_length" if declared else None)
    return {r["url"]: r for r in out.collect()}


EXPECTED = b"nutch rocks nutch rocks nutch rocks"

def _params(dispatcher):
    # TestExtParser:114-125 alternates cat and md5sum over the same blob
    # through the reference's dispatcher script (mime type = $1)
    return {
        "application/vnd.nutch.example.cat": (dispatcher, 10),
        "application/vnd.nutch.example.md5sum": (dispatcher, 10),
    }


def test_cat_and_md5sum_alternation(spark, dispatcher):
    rows = [("u-cat", EXPECTED, "application/vnd.nutch.example.cat"),
            ("u-md5", EXPECTED, "application/vnd.nutch.example.md5sum")]
    got = _run(spark, rows, _params(dispatcher))
    assert got["u-cat"]["status"] == "success"
    assert got["u-cat"]["text"] == EXPECTED.decode()
    assert got["u-md5"]["status"] == "success"
    assert got["u-md5"]["text"].startswith(
        hashlib.md5(EXPECTED).hexdigest())


def test_no_command_for_type(spark, dispatcher):
    got = _run(spark, [("u", b"x", "text/unknown")], _params(dispatcher))["u"]
    assert got["status"] == "failed"
    assert got["message"] == ("No external command defined for "
                              "contentType: text/unknown")


def test_truncation_gate(spark, dispatcher):
    rows = [("u", EXPECTED, "application/vnd.nutch.example.cat",
             len(EXPECTED) + 5)]
    got = _run(spark, rows, _params(dispatcher), declared=True)["u"]
    assert got["status"] == "failed"
    assert got["message"].startswith(
        f"Content truncated at {len(EXPECTED)} bytes.")


def test_nonzero_exit_captures_stderr(spark, dispatcher):
    # the dispatcher itself rejects unknown mime types with exit 1
    params = {"t/x": (dispatcher, 10)}
    got = _run(spark, [("u", b"x", "t/x")], params)["u"]
    assert got["status"] == "failed"
    assert got["message"].startswith("External command")
    assert "Can't parse mimeType t/x" in got["message"]


def test_timeout_fails(spark):
    # the appended mime type lands in $0 of the -c script
    params = {"t/slow": ("sh -c 'sleep 30'", 1)}
    got = _run(spark, [("u", b"x", "t/slow")], params)["u"]
    assert got["status"] == "failed"
    assert "timed out" in got["message"].lower()


def test_outlinks_from_command_output(spark, dispatcher):
    blob = b"see http://example.com/a and https://other.org/b?q=1 end"
    got = _run(spark, [("u", blob,
                        "application/vnd.nutch.example.cat")],
               _params(dispatcher))["u"]
    assert got["outlinks"] == ["http://example.com/a",
                               "https://other.org/b?q=1"]
