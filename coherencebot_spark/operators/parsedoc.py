"""parse-tika stand-in — real-format document parsing (PDF, DOCX, XLSX).

Reference surfaces re-expressed:

* ``plugin/parse-tika/.../TikaParser.java:94-180`` — mime-routed text +
  title + metadata extraction for non-HTML formats.  Tika is a library
  stack this sandbox does not carry; the PDF path is rebuilt from the
  public PDF spec in ``functions/pdftext.py`` (object scan, Flate
  streams, content-stream text machine), and the OOXML paths are plain
  ``zipfile`` + XML (docx/xlsx ARE zip containers — the same posture as
  the existing ``parse-zip`` plugin).
* ``plugin/parse-headings/.../HeadingsParser.java:91-159`` — PDF
  font-size heading selection into parse-meta ``heading`` (with the
  ``" [from PDF fonts]"`` rubric), ``pages``, and ``pdf_published``
  (docinfo created, else modified) — all three emitted as columns here.

Spark shape: ONE Arrow-batched ``mapInPandas`` over the content scan —
payload bytes never cross a shuffle, no groupBy follows, and each task
parses its own rows (at 100 TB this is the embarrassingly-parallel
stage; the expensive joins happen before/after on narrow columns).

Documented deltas: Tika's byte-sniffing mime detection is replaced by
the declared content type + magic-byte check (``%PDF`` / ``PK``);
encrypted PDFs and CID/Type0 composite fonts yield empty text (status
stays ``success`` with a message, matching Tika's empty-parse
behavior); OOXML styles beyond Title/Heading are not mapped.
"""
from __future__ import annotations

import io
import re
import zipfile

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.pdftext import (HEADING_RUBRIC, pdf_info, pdf_page_runs,
                                 pdf_text, select_heading, tagged_headings)

__all__ = ["parse_documents", "DOC_OUT_SCHEMA", "docx_parse", "xlsx_text"]

DOC_OUT_SCHEMA = (
    "url string, status string, message string, mime string, "
    "title string, heading string, text string, pages int, "
    "published string")

_WT_RE = re.compile(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.S)
_PARA_RE = re.compile(r"<w:p[ >].*?</w:p>", re.S)
_STYLE_RE = re.compile(r'<w:pStyle\s+w:val="(Title|Heading1)"')
_XT_RE = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_CORE_RE = {
    "title": re.compile(r"<dc:title>(.*?)</dc:title>", re.S),
    "created": re.compile(
        r"<dcterms:created[^>]*>(.*?)</dcterms:created>", re.S),
    "modified": re.compile(
        r"<dcterms:modified[^>]*>(.*?)</dcterms:modified>", re.S),
}
_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
        "&apos;": "'"}


def _unxml(s: str) -> str:
    for k, v in _ENT.items():
        s = s.replace(k, v)
    return s


def docx_parse(blob: bytes) -> dict:
    """``{title, heading, text, created, modified}`` from a .docx."""
    out = {"title": "", "heading": "", "text": "",
           "created": "", "modified": ""}
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        doc = zf.read("word/document.xml").decode("utf-8",
                                                  errors="replace")
        paras = []
        for p in _PARA_RE.findall(doc):
            text = _unxml("".join(_WT_RE.findall(p)))
            if not text:
                continue
            paras.append(text)
            if not out["heading"] and _STYLE_RE.search(p):
                out["heading"] = text
        out["text"] = "\n".join(paras)
        try:
            core = zf.read("docProps/core.xml").decode(
                "utf-8", errors="replace")
            for field, rx in _CORE_RE.items():
                m = rx.search(core)
                if m:
                    out[field] = _unxml(m.group(1)).strip()
        except KeyError:
            pass
    return out


def xlsx_text(blob: bytes) -> str:
    """Shared-strings text of a .xlsx (the Tika spreadsheet text walk
    subset: cell strings in table order)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        try:
            ss = zf.read("xl/sharedStrings.xml").decode(
                "utf-8", errors="replace")
        except KeyError:
            return ""
    return " ".join(_unxml(t) for t in _XT_RE.findall(ss)).strip()


def _parse_pdf(blob: bytes) -> dict:
    info = pdf_info(blob)
    runs = pdf_page_runs(blob, 0)   # HeadingsParser: page 1 only
    heading = select_heading(tagged_headings(runs))
    published = info.get("created") or info.get("modified") or ""
    return {
        "title": info.get("title", ""),
        "heading": heading + HEADING_RUBRIC if heading else "",
        "text": pdf_text(blob),
        "pages": int(info.get("pages", 0)),
        "published": published,
    }


def parse_documents(content: DataFrame, url_col: str = "url",
                    bytes_col: str = "bytes",
                    mime_col: str = "content_type") -> DataFrame:
    """One row per document: ``DOC_OUT_SCHEMA``.  Unknown formats fail
    softly (``status='failed'``) like ParseUtil's no-parser path."""
    src = content.select(url_col, bytes_col, mime_col)

    def extract(it):
        for pdf_batch in it:
            out = {k: [] for k in ("url", "status", "message", "mime",
                                   "title", "heading", "text", "pages",
                                   "published")}
            for u, raw, mime in zip(pdf_batch[url_col],
                                    pdf_batch[bytes_col],
                                    pdf_batch[mime_col]):
                blob = bytes(raw) if raw is not None else b""
                mime = (mime or "").split(";")[0].strip().lower()
                status, message = "success", ""
                doc = {"title": "", "heading": "", "text": "",
                       "pages": 0, "published": ""}
                try:
                    if mime == "application/pdf" or \
                            blob[:5] == b"%PDF-":
                        mime = "application/pdf"
                        doc.update(_parse_pdf(blob))
                        if not doc["text"] and not doc["pages"]:
                            status = "failed"
                            message = "Can't be handled as PDF document."
                    elif mime.endswith("wordprocessingml.document") or \
                            (blob[:2] == b"PK" and
                             mime == "application/octet-stream"):
                        d = docx_parse(blob)
                        doc.update(title=d["title"], heading=d["heading"],
                                   text=d["text"],
                                   published=d["created"] or d["modified"])
                        mime = ("application/vnd.openxmlformats-"
                                "officedocument.wordprocessingml.document")
                    elif mime.endswith("spreadsheetml.sheet"):
                        doc["text"] = xlsx_text(blob)
                    else:
                        status = "failed"
                        message = f"No parser for mime type {mime}"
                except Exception as e:  # noqa: BLE001 — Tika-style soft fail
                    status = "failed"
                    message = f"Unable to parse content: {e}"
                out["url"].append(u)
                out["status"].append(status)
                out["message"].append(message)
                out["mime"].append(mime)
                out["title"].append(doc["title"])
                out["heading"].append(doc["heading"])
                out["text"].append(doc["text"])
                out["pages"].append(doc["pages"])
                out["published"].append(doc["published"])
            yield pd.DataFrame(out)

    return src.mapInPandas(extract, schema=DOC_OUT_SCHEMA)
