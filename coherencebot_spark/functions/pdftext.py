"""From-scratch PDF text + font-size extraction (stdlib only).

Closes the parse-tika gap for the format that matters most to the
reference deployment: PDFs.  The reference routes PDFs through Tika's
PDFParser and then `parse-headings`' font-size title selector
(``plugin/parse-headings/.../PDF2Heading.java:83-111`` emits
``[n size]`` tags on font-size switches among "heading" glyphs;
``HeadingsParser.java:166-231`` selects the top-3 font sizes into a
snippet title).  Both behaviors are re-expressed here over a minimal
PDF reader built from the public PDF 1.7 spec (ISO 32000-1):

* object scan (``N G obj … endobj``) — no xref walk; robust to the
  linearized/incremental files a crawler sees, where xref tables are
  routinely stale or split,
* FlateDecode stream decode (``zlib``), literal ``/Length`` honored,
  ``endstream`` fallback otherwise,
* content-stream text machine: ``BT/ET``, ``Tf`` (size), ``Tm``
  (effective scale = hypot(a,b) — the PDFBox ``getFontSizeInPt``
  analogue), ``Td/TD/T*/'/"`` line breaks, ``Tj/TJ`` show ops,
  literal strings with escapes/octal + hex strings (UTF-16BE when
  BOM-prefixed),
* bold detection from the font object's ``/BaseFont`` name (the
  sandbox has no AFM metrics; ``FontDescriptor.getFontWeight() > 400``
  ≈ a ``Bold`` face name — documented delta),
* ``/Info`` dict (Title/CreationDate/ModDate) + page count.

Honest limits (documented, test-asserted): no CID/Type0 ToUnicode
CMaps (composite-font glyphs come out as raw bytes — same visible
failure mode Tika has on fontless scans), no encrypted PDFs, no
JPX/DCT image xobjects (images are opaque to text extraction anyway).
"""
from __future__ import annotations

import math
import re
import zlib

__all__ = [
    "pdf_pages", "pdf_page_runs", "pdf_text", "pdf_info",
    "tagged_headings", "select_heading", "HEADING_RUBRIC",
]

HEADING_RUBRIC = " [from PDF fonts]"

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")
_LEN_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[(.*?)\])", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_FONTMAP_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONTREF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_BASEFONT_RE = re.compile(rb"/BaseFont\s*/([^\s/<>\[\]()]+)")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")


def _objects(blob: bytes) -> dict[int, bytes]:
    """``{object number: body}`` for every top-level indirect object.

    Scans for ``obj``/``endobj`` pairs instead of the xref table: the
    xref is redundant for extraction and frequently wrong in the
    incrementally-updated files a crawler fetches.  A later duplicate
    object number wins (incremental-update semantics)."""
    out: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(blob):
        start = m.end()
        # stream objects may contain 'endobj' inside the data: find the
        # stream extent first, then the endobj after it
        sm = _STREAM_RE.search(blob, start)
        end = blob.find(b"endobj", start)
        if sm is not None and (end == -1 or sm.start() < end):
            data_start = sm.end()
            lm = _LEN_RE.search(blob, start, sm.start())
            if lm:
                data_end = data_start + int(lm.group(1))
            else:
                data_end = blob.find(b"endstream", data_start)
                if data_end == -1:
                    continue
            end = blob.find(b"endobj", data_end)
        if end == -1:
            continue
        out[int(m.group(1))] = blob[start:end]
    return out


def _stream_data(body: bytes) -> bytes | None:
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    data_start = sm.end()
    lm = _LEN_RE.search(body, 0, sm.start())
    if lm:
        data = body[data_start:data_start + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end == -1:
            return None
        data = body[data_start:end].rstrip(b"\r\n")
    if b"/FlateDecode" in body[:sm.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _decode_text_string(raw: bytes) -> str:
    """PDF text-string decode: UTF-16BE when BOM'd, else PDFDocEncoding
    (≈ latin-1 for the printable range we extract)."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except Exception:  # noqa: BLE001
            pass
    return raw.decode("latin-1", errors="replace")


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        mapped = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                  0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}.get(e)
        if mapped is not None:
            out.append(mapped)
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e in (0x0A, 0x0D):  # line continuation
            i += 1
            if e == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(e)
            i += 1
    return bytes(out)


_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s/<>\[\]()%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]{0,2}")


def _tokens(data: bytes):
    """Content-stream lexer: yields ('str', bytes) / ('num', float) /
    ('name', bytes) / ('op', bytes) / ('[', None) / (']', None)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # ( literal string, balanced with escapes
            depth, j = 1, i + 1
            while j < n and depth:
                cj = data[j]
                if cj == 0x5C:
                    j += 2
                    continue
                if cj == 0x28:
                    depth += 1
                elif cj == 0x29:
                    depth -= 1
                j += 1
            yield ("str", _unescape_literal(data[i + 1:j - 1]))
            i = j
        elif data[i:i + 2] == b"<<":
            yield ("op", b"<<")
            i += 2
        elif data[i:i + 2] == b">>":
            yield ("op", b">>")
            i += 2
        elif c == 0x3C:  # <hex>
            j = data.find(b">", i)
            if j == -1:
                break
            h = re.sub(rb"\s", b"", data[i + 1:j])
            if len(h) % 2:
                h += b"0"
            try:
                yield ("str", bytes.fromhex(h.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c == 0x5B:
            yield ("[", None)
            i += 1
        elif c == 0x5D:
            yield ("]", None)
            i += 1
        elif c == 0x2F:
            m = _NAME_RE.match(data, i)
            yield ("name", m.group())
            i = m.end()
        else:
            m = _NUM_RE.match(data, i)
            if m:
                yield ("num", float(m.group()))
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                yield ("op", m.group())
                i = m.end()
            else:
                i += 1


def _page_font_bold(objs: dict[int, bytes], page_body: bytes) -> dict:
    """Map content-stream font resource name (e.g. ``/F2``) → bold."""
    bold: dict[bytes, bool] = {}
    fm = _FONTMAP_RE.search(page_body)
    if not fm:
        return bold
    for name, ref in _FONTREF_RE.findall(fm.group(1)):
        fbody = objs.get(int(ref), b"")
        bm = _BASEFONT_RE.search(fbody)
        base = bm.group(1) if bm else b""
        bold[b"/" + name] = b"Bold" in base or b"Black" in base \
            or b"Heavy" in base
    return bold


def pdf_pages(blob: bytes) -> list[list[tuple[float, bool, str]]]:
    """Per page: list of ``(effective_font_size_pt, bold, text)`` runs
    in content-stream order.  Line-break operators insert a newline run
    so downstream text joins read naturally."""
    objs = _objects(blob)
    pages = []
    for num in sorted(objs):
        body = objs[num]
        if not _PAGE_RE.search(body) or _STREAM_RE.search(body):
            continue
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        refs = [int(cm.group(1))] if cm.group(1) else [
            int(r) for r in _REF_RE.findall(cm.group(2))]
        data = b"".join(
            (_stream_data(objs.get(r, b"")) or b"") for r in refs)
        pages.append(_run_machine(data, _page_font_bold(objs, body)))
    return pages


def _run_machine(data: bytes, bold_map: dict) -> list:
    runs: list[tuple[float, bool, str]] = []
    size, scale, bold = 0.0, 1.0, False
    y_pos: float | None = None
    stack: list = []
    in_array: list | None = None

    def emit(raw: bytes):
        if raw:
            runs.append((round(size * scale, 2), bold,
                         _decode_text_string(raw)))

    def newline():
        if runs and not runs[-1][2].endswith("\n"):
            runs.append((0.0, False, "\n"))

    for kind, val in _tokens(data):
        if kind == "[":
            in_array = []
        elif kind == "]":
            if in_array is not None:
                for s in in_array:
                    emit(s)
                in_array = None
        elif kind == "str":
            if in_array is not None:
                in_array.append(val)
            else:
                stack.append(val)
        elif kind in ("num", "name"):
            if in_array is None:
                stack.append(val)
        elif kind == "op":
            op = val
            if op == b"Tf" and len(stack) >= 2:
                size = float(stack[-1])
                fname = stack[-2]
                if isinstance(fname, bytes):
                    bold = bold_map.get(fname, False)
            elif op == b"Tm" and len(stack) >= 6:
                a, b = float(stack[-6]), float(stack[-5])
                scale = math.hypot(a, b) or 1.0
                # vertical reposition = new visual line (the PDFBox
                # sort-by-position analogue)
                f = float(stack[-1])
                if y_pos is not None and f != y_pos:
                    newline()
                y_pos = f
            elif op == b"BT":
                scale = 1.0
                y_pos = None
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                emit(stack[-1])
            elif op == b"'" and stack and isinstance(stack[-1], bytes):
                newline()
                emit(stack[-1])
            elif op == b'"' and stack and isinstance(stack[-1], bytes):
                newline()
                emit(stack[-1])
            elif op in (b"Td", b"TD", b"T*"):
                newline()
            stack.clear()
    return runs


def pdf_page_runs(blob: bytes, page: int = 0) -> list:
    pages = pdf_pages(blob)
    return pages[page] if page < len(pages) else []


def pdf_text(blob: bytes) -> str:
    """Whole-document text (the Tika-PDFParser surface): all runs, all
    pages, newline between pages, whitespace normalized."""
    parts = []
    for page in pdf_pages(blob):
        parts.append("".join(r[2] for r in page))
    return re.sub(r"[ \t]*\n[ \t]*", "\n",
                  "\n".join(parts)).strip()


def pdf_info(blob: bytes) -> dict:
    """``/Info`` metadata + structural page count: ``{title, created,
    modified, pages}`` (absent keys omitted, pages always present)."""
    objs = _objects(blob)
    out: dict = {"pages": sum(
        1 for b in objs.values()
        if _PAGE_RE.search(b) and not _STREAM_RE.search(b))}
    im = _INFO_RE.search(blob)
    if im:
        body = objs.get(int(im.group(1)), b"")
        for key, field in ((b"/Title", "title"),
                           (b"/CreationDate", "created"),
                           (b"/ModDate", "modified")):
            km = re.search(re.escape(key) + rb"\s*\(", body)
            if km:
                # balanced literal-string scan from the opening paren
                depth, j = 1, km.end()
                while j < len(body) and depth:
                    if body[j] == 0x5C:
                        j += 2
                        continue
                    if body[j] == 0x28:
                        depth += 1
                    elif body[j] == 0x29:
                        depth -= 1
                    j += 1
                out[field] = _decode_text_string(
                    _unescape_literal(body[km.end():j - 1]))
                continue
            km = re.search(re.escape(key) + rb"\s*<([0-9A-Fa-f\s]*)>",
                           body)
            if km:
                h = re.sub(rb"\s", b"", km.group(1))
                if len(h) % 2:
                    h += b"0"
                out[field] = _decode_text_string(
                    bytes.fromhex(h.decode("ascii")))
    return out


def _fmt_size(size: float) -> str:
    """Java ``Float.toString`` parity for the sizes we tag: one decimal
    when integral (24.0 → "24.0"), else the shortest repr."""
    s = repr(size)
    return s if "." in s else s + ".0"


def tagged_headings(runs: list) -> str:
    """``PDF2Heading.writeString`` parity (PDF2Heading.java:83-111):
    heading glyphs are font size ≥ 14 pt, or > 10 pt with weight > 400
    (here: a Bold/Black face); a ``[n size]`` tag is emitted whenever
    the heading font size changes; ONLY heading glyphs are written."""
    out = []
    prev = 0.0
    n = 0
    for size, bold, text in runs:
        if text == "\n":
            continue
        heading = size >= 14.0 or (size > 10.0 and bold)
        if not heading:
            continue
        if size != prev:
            out.append(f"[{n} {_fmt_size(size)}]")
            prev = size
            n += 1
        out.append(text)
    return "".join(out)


_FONT_TAG_RE = re.compile(r"\[\d+ (\d{2,3}\.\d*)\]")
_HEADING_RE = re.compile(r"\[\d+ (\d{2,3}\.\d*)\]([^\[]+)")


def select_heading(tagged: str) -> str:
    """``HeadingsParser.getHeading`` parity (HeadingsParser.java:166-231):
    keep the top-3 distinct font sizes, take tagged blocks until 3
    headings AND 10 words are reached, ``- `` separator on a font-size
    switch when the block has > 1 word, 29-word cap per block."""
    sizes = {float(m.group(1)) for m in _FONT_TAG_RE.finditer(tagged)}
    top3 = set(sorted(sizes, reverse=True)[:3])
    sb: list[str] = []
    n_head = n_words = 0
    last = 0.0
    for m in _HEADING_RE.finditer(tagged):
        if not (n_head < 3 or n_words < 10):
            break
        size = float(m.group(1))
        heading = m.group(2)
        if size in top3 and len(heading) > 0:
            heading = heading.strip()
            if sb:
                sb.append(" ")
                if last != size and len(heading.split(" ")) > 1:
                    sb.append("- ")
            words = heading.split(" ")
            if len(words) > 30:
                heading = " ".join(words[:29])
            sb.append(heading)
            n_head += 1
            n_words += len(heading.split(" "))
        last = size
    return "".join(sb)
