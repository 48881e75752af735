"""parse-tika stand-in: PDF text/heading extraction + OOXML parsing.

The PDFs under test come from ``synth/pdfs.build_pdf`` — real spec-valid
files (xref, Flate streams, fonts) — so the reader faces genuine
structure.  Heading-selection cases mirror
``parse-headings/.../HeadingsParser.java:166-231``.
"""
from __future__ import annotations

import io
import zipfile

import pytest

from coherencebot_spark.functions.pdftext import (
    HEADING_RUBRIC, pdf_info, pdf_page_runs, pdf_text, select_heading,
    tagged_headings)
from coherencebot_spark.operators.parsedoc import (docx_parse,
                                                   parse_documents,
                                                   xlsx_text)
from coherencebot_spark.synth.pdfs import build_pdf

TITLE_LINES = [
    ("Annual Water Report", 24.0, False),
    ("A subtitle for the report", 18.0, False),
    ("Prepared by the Bureau", 11.0, True),     # bold >10pt = heading
    ("Plain body text paragraph.", 10.0, False),
]


def _docx(paragraphs, title="", created="", heading_first=False) -> bytes:
    buf = io.BytesIO()
    body = []
    for i, p in enumerate(paragraphs):
        style = ('<w:pPr><w:pStyle w:val="Title"/></w:pPr>'
                 if heading_first and i == 0 else "")
        body.append(f"<w:p >{style}<w:r><w:t>{p}</w:t></w:r></w:p>")
    doc = ("<w:document><w:body>" + "".join(body) +
           "</w:body></w:document>")
    core = (f"<cp:coreProperties><dc:title>{title}</dc:title>"
            f'<dcterms:created xsi:type="dcterms:W3CDTF">{created}'
            f"</dcterms:created></cp:coreProperties>")
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
        zf.writestr("docProps/core.xml", core)
    return buf.getvalue()


def test_pdf_round_trip_runs_and_info():
    pdf = build_pdf(TITLE_LINES, title="meta title",
                    created="D:20240102030405Z", extra_pages=2)
    info = pdf_info(pdf)
    assert info["pages"] == 3
    assert info["title"] == "meta title"
    assert info["created"] == "D:20240102030405Z"
    runs = [r for r in pdf_page_runs(pdf, 0) if r[2] != "\n"]
    assert runs[0] == (24.0, False, "Annual Water Report")
    assert runs[2][1] is True          # bold face detected
    text = pdf_text(pdf)
    assert "Plain body text paragraph." in text
    assert "Body page 3 text." in text
    # vertical repositions become line breaks
    assert "Annual Water Report\n" in text


def test_pdf_uncompressed_and_utf16_title():
    pdf = build_pdf([("Caf\xe9 Report Title", 20.0, False)],
                    compress=False)
    assert pdf_page_runs(pdf, 0)[0][2] == "Caf\xe9 Report Title"


def test_tagged_headings_writestring_parity():
    # PDF2Heading.java:92-107: tag on size switch, small fonts dropped,
    # bold >10pt kept
    runs = [(24.0, False, "Big"), (24.0, False, " title"),
            (9.0, False, "tiny"), (11.0, True, "BoldSub"),
            (24.0, False, "Again")]
    assert (tagged_headings(runs)
            == "[0 24.0]Big title[1 11.0]BoldSub[2 24.0]Again")


def test_select_heading_subtitle_and_caps():
    tagged = ("[0 36.0]Some big title[1 24.0]Some subtitle"
              "[2 18.0]Third level[3 12.0]ignored small")
    # top-3 sizes = 36/24/18; subtitle rule inserts "- " on size switch
    assert (select_heading(tagged)
            == "Some big title - Some subtitle - Third level")
    # 30+ word block capped at 29 words (HeadingsParser.java:219-222)
    long = " ".join(f"w{i}" for i in range(40))
    got = select_heading(f"[0 30.0]{long}")
    assert got.split(" ") == long.split(" ")[:29]


def test_select_heading_stops_at_three_blocks_and_ten_words():
    tagged = ("[0 30.0]one two three four five[1 28.0]six seven"
              "[2 26.0]eight nine ten eleven[3 24.0]never picked")
    assert select_heading(tagged).endswith("eleven")


def test_docx_and_xlsx():
    blob = _docx(["Doc Title Para", "Second para"], title="core title",
                 created="2024-01-02T03:04:05Z", heading_first=True)
    d = docx_parse(blob)
    assert d["title"] == "core title"
    assert d["heading"] == "Doc Title Para"
    assert "Second para" in d["text"]
    assert d["created"].startswith("2024-01-02")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/sharedStrings.xml",
                    "<sst><si><t>alpha</t></si><si><t>beta</t></si></sst>")
    assert xlsx_text(buf.getvalue()) == "alpha beta"


def test_parse_documents_operator(spark):
    rows = [
        ("u://pdf", build_pdf(TITLE_LINES, title="t1",
                              created="D:20240101Z", extra_pages=1),
         "application/pdf"),
        ("u://docx", _docx(["Hello docx"], title="dt"),
         "application/vnd.openxmlformats-officedocument."
         "wordprocessingml.document"),
        ("u://junk", b"\x00\x01\x02", "application/x-unknown"),
        ("u://trunc", b"%PDF-1.4 garbage", "application/pdf"),
    ]
    df = spark.createDataFrame(rows, "url string, bytes binary, "
                                     "content_type string")
    got = {r.url: r for r in parse_documents(df).collect()}
    p = got["u://pdf"]
    assert p.status == "success" and p.pages == 2
    assert p.title == "t1" and p.published == "D:20240101Z"
    assert p.heading.endswith(HEADING_RUBRIC)
    assert p.heading.startswith("Annual Water Report - A subtitle")
    d = got["u://docx"]
    assert d.status == "success" and d.title == "dt"
    assert "Hello docx" in d.text
    assert got["u://junk"].status == "failed"
    assert got["u://trunc"].status == "failed"


def test_pdf_heading_feeds_criteria_best_title(spark):
    """End-to-end link: the PDF font heading produced by parse_documents
    carries the ``[from PDF fonts]`` rubric that the index-criteria
    bestTitle selector (CriteriaIndexer.java:131-154) strips and
    prefers over a junk metadata title."""
    from pyspark.sql import functions as F

    from coherencebot_spark.operators.indexing import criteria_filter

    pdf = build_pdf([("A Genuinely Strong Document Title With Mixed "
                      "Case Words", 24.0, False)], title="untitled")
    content = spark.createDataFrame(
        [("u://1", pdf, "application/pdf")],
        "url string, bytes binary, content_type string")
    parsed = parse_documents(content)
    doc = parsed.select(
        "url", "title", "heading",
        F.lit("x" * 5000).alias("text"),
        F.lit(None).cast("array<string>").alias("anchor"))
    out = criteria_filter(min_length=4000)(doc).collect()[0]
    assert out.title.startswith("A Genuinely Strong Document Title")
    assert "[from PDF fonts]" not in out.title
    assert out.title_algorithm == "from PDF fonts"


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_stream_length_and_fallback(compress):
    # both the literal-/Length slice and the endstream fallback paths
    pdf = build_pdf([("X marks the heading", 16.0, False)],
                    compress=compress)
    assert pdf_page_runs(pdf, 0)[0][2] == "X marks the heading"
