"""Deterministic minimal-PDF writer (stdlib only) for tests/oracles.

Produces real, spec-valid PDF 1.4 files — object table, pages tree,
Helvetica / Helvetica-Bold fonts, FlateDecode content streams, Info
dict, correct xref offsets — so the from-scratch reader in
``functions/pdftext.py`` is exercised against genuine structure rather
than a fixture of its own making (same posture as ``synth/images.py``'s
real png/bmp/jpeg codecs)."""
from __future__ import annotations

import zlib

__all__ = ["build_pdf"]


def _esc(s: str) -> bytes:
    return (s.replace("\\", r"\\").replace("(", r"\(")
             .replace(")", r"\)").encode("latin-1", errors="replace"))


def _content_stream(lines, y0: float = 720.0) -> bytes:
    """``lines``: iterable of (text, size_pt, bold).  One text line per
    entry, cursor stepped down by 1.4 × size."""
    ops = [b"BT"]
    y = y0
    for text, size, bold in lines:
        font = b"/F2" if bold else b"/F1"
        ops.append(font + f" {size:g} Tf".encode())
        ops.append(f"1 0 0 1 72 {y:g} Tm".encode())
        ops.append(b"(" + _esc(text) + b") Tj")
        y -= 1.4 * size
    ops.append(b"ET")
    return b"\n".join(ops)


def build_pdf(lines, *, title: str | None = None,
              created: str | None = None, modified: str | None = None,
              extra_pages: int = 0, compress: bool = True) -> bytes:
    """A complete PDF.  ``lines`` = [(text, size_pt, bold), ...] laid
    out on page 1; ``extra_pages`` appends body-text pages so the page
    count is structural, not cosmetic.  ``created``/``modified`` are
    raw PDF date strings (e.g. ``D:20240102030405Z``)."""
    pages = [list(lines)]
    for i in range(extra_pages):
        pages.append([(f"Body page {i + 2} text.", 11.0, False)])

    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    # 1=catalog 2=pages 3..=page objs, then content, fonts, info
    page_ids = list(range(3, 3 + n_pages))
    content_ids = list(range(3 + n_pages, 3 + 2 * n_pages))
    font1_id = 3 + 2 * n_pages
    font2_id = font1_id + 1
    info_id = font2_id + 1

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(f"{p} 0 R".encode() for p in page_ids)
    objs[2] = (b"<< /Type /Pages /Kids [" + kids +
               f"] /Count {n_pages} >>".encode())
    for pid, cid, page in zip(page_ids, content_ids, pages):
        objs[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 " + f"{font1_id}".encode() +
            b" 0 R /F2 " + f"{font2_id}".encode() + b" 0 R >> >> "
            b"/Contents " + f"{cid}".encode() + b" 0 R >>")
        data = _content_stream(page)
        if compress:
            data = zlib.compress(data)
            head = (f"<< /Length {len(data)} /Filter /FlateDecode >>"
                    .encode())
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objs[cid] = head + b"\nstream\n" + data + b"\nendstream"
    objs[font1_id] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")
    objs[font2_id] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica-Bold >>")
    info = b"<<"
    if title is not None:
        info += b" /Title (" + _esc(title) + b")"
    if created is not None:
        info += b" /CreationDate (" + _esc(created) + b")"
    if modified is not None:
        info += b" /ModDate (" + _esc(modified) + b")"
    info += b" >>"
    objs[info_id] = info

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(buf)
    n = max(objs) + 1
    buf += f"xref\n0 {n}\n".encode()
    buf += b"0000000000 65535 f \n"
    for i in range(1, n):
        buf += f"{offsets[i]:010d} 00000 n \n".encode()
    buf += (b"trailer\n<< /Size " + f"{n}".encode() +
            b" /Root 1 0 R /Info " + f"{info_id}".encode() +
            b" 0 R >>\nstartxref\n" + f"{xref_at}".encode() +
            b"\n%%EOF\n")
    return bytes(buf)
