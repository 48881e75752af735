"""text-summarizer parity tests (reference src/plugin/text-summarizer:
SummaryTool sentence scoring, TextSummarizer field precedence/cleanup)."""

from __future__ import annotations

from coherencebot_spark.operators.summary import (
    clean_summary, extract_heading, summarize_text, summary_filter,
)

S1 = "alpha beta gamma delta epsilon zeta one"
S2 = "alpha beta gamma delta eta theta two"
S3 = "omega psi chi phi upsilon something three"


def test_summarize_topn_reading_order():
    # trailing separator so the last candidate is clean (without it the
    # final sentence keeps its own period and gains another — exactly
    # what Java's split("\\.\\s+") + trim + "." produces too)
    text = f"{S3}. {S1}. {S2}. "
    # s1/s2 share 4 words → dominate; top-2 emitted in READING order
    # (s1 before s2 even though s3 comes first in the text)
    assert summarize_text(text, count=2) == f"{S1}. [...] {S2}."
    # count larger than sentence count keeps everything, in order
    assert summarize_text(text, count=9) == \
        f"{S3}. [...] {S1}. [...] {S2}."
    # the unterminated-text double-period quirk is shared with the
    # reference, not papered over
    assert summarize_text(f"{S1}. {S2}.", count=9).endswith("two..")


def test_summarize_sentence_gates():
    # < 20 chars (pre-trim) skipped; > 400 chars truncated
    short = "tiny one."
    long_s = "x" * 500 + " yy"
    out = summarize_text(f"{short}  {S1}. {long_s}.", count=9)
    assert "tiny" not in out
    assert S1 + "." in out
    assert ("x" * 400 + ".") in out and "yy" not in out


def test_pdf_spacing_and_case_split():
    # missing space after a period before an uppercase letter is repaired
    # before sentence splitting (SummaryTool ctor)
    text = f"{S1} end of part.Next sentence starts capital here."
    out = summarize_text(text, count=9)
    assert "part. [...] Next" in out or out.count("[...]") == 1


def test_clean_summary():
    assert clean_summary("see http://x.org/a?b=1 now\x07 ok") == "see now ok"
    assert clean_summary("") == ""


def test_extract_heading_rules():
    # first line in the 15..100 window wins, with the suffix
    text = "short\nThis is a proper heading line\nrest of the text"
    assert extract_heading(text) == \
        "This is a proper heading line [from PDF text]"
    # an over-long line aborts the search entirely
    text2 = "short\n" + ("y" * 150) + "\nThis is a proper heading line"
    assert extract_heading(text2) is None
    assert extract_heading(None) is None


def test_summary_filter_precedence_and_lengths(spark):
    long_text = f"{S3}. {S1}. {S2}. "
    pdf_text = ("A Proper Pdf Heading Line\n" + (S1 + ". ") * 120)
    rows = [
        # existing summary column wins untouched
        ("u1", long_text, "existing summary", {"metatag.description": "md"},
         "text/html", "T", None),
        # no summary → metatag.description wins, map untouched
        ("u2", long_text, None, {"metatag.description": "from meta"},
         "text/html", "Ti", "anchor text"),
        # neither → generated from text; metatag keys dropped from map
        ("u3", long_text, None, {"metatag.description": "",
                                 "other": "keep"}, "text/html", None, None),
        # pdf with >4000 chars → heading extracted
        ("u4", pdf_text, "s", {}, "application/pdf", "T4", None),
    ]
    doc = spark.createDataFrame(
        rows, "url string, text string, summary string, "
              "parse_meta map<string,string>, type string, "
              "title string, anchor string")
    out = {r.url: r for r in summary_filter()(doc).collect()}

    assert out["u1"].summary == "existing summary"
    assert dict(out["u1"].parse_meta) == {"metatag.description": "md"}
    assert out["u2"].summary == "from meta"
    assert out["u3"].summary == f"{S3}. [...] {S1}. [...] {S2}."
    assert dict(out["u3"].parse_meta) == {"other": "keep"}

    # heading only on the pdf row (its text is > 4000 chars)
    assert out["u4"].heading == "A Proper Pdf Heading Line [from PDF text]"
    assert out["u1"].heading is None
    # length fields
    assert out["u1"].contentLength == len(long_text)
    assert out["u1"].titleLength == 1 and out["u2"].titleLength == 2
    assert out["u2"].anchorLength == len("anchor text")
    assert out["u3"].titleLength == 0 and out["u3"].anchorLength == 0
    assert out["u4"].headingLength == len(out["u4"].heading)
