"""parse-ext plugin — external-command parser extension point.

Reference: ``plugin/parse-ext/.../ExtParser.java:51-146``.  The plugin
maps a content type to a shell command (plus timeout and output
encoding); the raw document bytes are piped to the command's stdin with
the content type appended as an argv token, stdout becomes the parse
text, and outlinks are pulled from that text with the plain-text
``OutlinkExtractor`` regex.  Failure modes:

* no command registered for the content type →
  ``"No external command defined for contentType: <type>"`` (:73-76);
* declared Content-Length ≠ actual bytes → ``FAILED_TRUNCATED`` (:93-100);
* non-zero exit → ``"External command <cmd> failed with error: <stderr>"``
  (:117-120);
* timeout / runtime exception → failed row with the exception text
  (:124-127).

Spark shape: the subprocess invocation is inherently per-document —
that IS the extension point's contract (the reference runs one
``CommandRunner`` per document inside the parse mapper).  It runs inside
one Arrow-batched ``mapInPandas`` stage over the content scan, so the
per-row cost parallelizes across executors exactly like the reference's
parse mappers, and nothing shuffles before or after the Python stage.
Commands must exist on every executor (same operational contract as the
reference's cluster nodes).
"""

from __future__ import annotations

import shlex
import subprocess

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.outlinks import URL_PATTERN

__all__ = ["parse_ext", "EXT_OUT_SCHEMA", "TIMEOUT_DEFAULT"]

EXT_OUT_SCHEMA = (
    "url string, status string, message string, text string, "
    "outlinks array<string>"
)

TIMEOUT_DEFAULT = 30  # ExtParser.java:59 (seconds)


def parse_ext(content: DataFrame, type_params: dict[str, tuple],
              url_col: str = "url", bytes_col: str = "bytes",
              ctype_col: str = "content_type",
              declared_len_col: str | None = None) -> DataFrame:
    """Run the registered external command per document.

    ``type_params``: ``{content_type: (command, timeout_s, encoding)}``
    — the reference's ``TYPE_PARAMS_MAP`` (:62,130-146); ``timeout_s`` /
    ``encoding`` may be omitted by passing a 1- or 2-tuple (defaults 30 s
    / utf-8).  The content type is appended to the command argv
    (``cr.setCommand(command + " " + contentType)``, :110)."""
    params = {}
    for ctype, spec in type_params.items():
        spec = (spec,) if isinstance(spec, str) else tuple(spec)
        cmd = spec[0]
        timeout = int(spec[1]) if len(spec) > 1 else TIMEOUT_DEFAULT
        encoding = spec[2] if len(spec) > 2 else "utf-8"
        params[ctype] = (cmd, timeout, encoding)

    cols = [url_col, bytes_col, ctype_col] + (
        [declared_len_col] if declared_len_col else [])
    src = content.select(*cols)
    has_len = declared_len_col is not None

    def run(it):
        for pdf in it:
            out = {k: [] for k in ("url", "status", "message", "text",
                                   "outlinks")}
            lens = pdf[declared_len_col] if has_len else None
            for i, (u, raw, ct) in enumerate(
                    zip(pdf[url_col], pdf[bytes_col], pdf[ctype_col])):
                status, message, text = "success", "", ""
                spec = params.get(ct)
                blob = bytes(raw) if raw is not None else b""
                declared = None
                if has_len and lens.iloc[i] is not None \
                        and not pd.isna(lens.iloc[i]):
                    declared = int(lens.iloc[i])
                if spec is None:
                    status = "failed"
                    message = ("No external command defined for "
                               f"contentType: {ct}")
                elif declared is not None and declared != len(blob):
                    status = "failed"
                    message = (f"Content truncated at {len(blob)} bytes. "
                               f"Parser can't handle incomplete {ct} file.")
                else:
                    cmd, timeout, encoding = spec
                    argv = shlex.split(cmd) + [ct]
                    try:
                        proc = subprocess.run(
                            argv, input=blob, capture_output=True,
                            timeout=timeout)
                        if proc.returncode != 0:
                            status = "failed"
                            message = (f"External command {cmd} failed "
                                       "with error: "
                                       + proc.stderr.decode(
                                           encoding, errors="replace"))
                        else:
                            text = proc.stdout.decode(encoding,
                                                      errors="replace")
                    except Exception as e:  # noqa: BLE001 — :124 catches all
                        status = "failed"
                        message = str(e)
                links = [m.strip()
                         for m in URL_PATTERN.findall(text)] if text else []
                out["url"].append(u)
                out["status"].append(status)
                out["message"].append(message)
                out["text"].append(text)
                out["outlinks"].append(links)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=EXT_OUT_SCHEMA)
