"""Dependency-free minimal PDF 1.4 writer (sink K2's converter).

The reference shells out to wkhtmltopdf per page and verifies the
output is a non-empty PDF (html_to_pdf_converter.py:105-165, check at
:153-158). That binary does not exist in this container, so the engine
ships an honest, structurally-valid converter instead of a stub: HTML
is flattened to text lines and typeset into a real multi-page PDF —
catalog / page tree / Type1 Helvetica / FlateDecode content streams /
correct xref byte offsets — using only the stdlib (re, zlib). Any PDF
reader (and the xref-walking assertions in tests/test_sinks_and_
functions.py) can parse the result; wkhtmltopdf remains the preferred
converter where installed (operators/sinks.py picks it up).

Layout model: US-Letter, 10 pt Helvetica, 12 pt leading, fixed wrap —
deliberately minimal (the reference's DPI/quality options shape raster
output, not document structure).
"""

from __future__ import annotations

import re
import zlib

PAGE_W, PAGE_H = 612, 792  # US Letter, 1/72 inch units
MARGIN = 54
FONT_SIZE = 10
LEADING = 12
LINES_PER_PAGE = (PAGE_H - 2 * MARGIN) // LEADING  # 57
WRAP_COLS = 95

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def html_to_lines(html: str, wrap: int = WRAP_COLS) -> list[str]:
    """Flatten HTML to wrapped text lines: tags -> spaces (block tags
    first become newlines so paragraphs keep their breaks), whitespace
    collapsed, hard-wrapped at ``wrap`` columns."""
    text = re.sub(r"(?i)</(p|div|h[1-6]|li|tr|pre)>|<br\s*/?>", "\n", html or "")
    text = _TAG_RE.sub(" ", text)
    lines: list[str] = []
    for raw in text.split("\n"):
        collapsed = _WS_RE.sub(" ", raw).strip()
        if not collapsed:
            continue
        for start in range(0, len(collapsed), wrap):
            lines.append(collapsed[start : start + wrap])
    return lines or [""]


def _pdf_escape(line: str) -> bytes:
    """PDF literal-string escaping; text is narrowed to Latin-1 (the
    standard-font encoding a minimal writer can honestly claim)."""
    out = line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    return out.encode("latin-1", "replace")


def _content_stream(lines: list[str]) -> bytes:
    """One page's FlateDecode content stream: begin text, set font and
    leading, emit each line with a next-line advance."""
    parts = [
        b"BT",
        f"/F1 {FONT_SIZE} Tf".encode(),
        f"{LEADING} TL".encode(),
        f"{MARGIN} {PAGE_H - MARGIN} Td".encode(),
    ]
    for i, line in enumerate(lines):
        if i:
            parts.append(b"T*")
        parts.append(b"(" + _pdf_escape(line) + b") Tj")
    parts.append(b"ET")
    return zlib.compress(b"\n".join(parts))


def html_to_pdf_bytes(html: str | None) -> bytes:
    """Render HTML to a complete, parseable PDF 1.4 byte string.

    Object layout: 1 catalog, 2 page tree, 3 font, then (page, content)
    pairs. The xref table carries real byte offsets — readers that walk
    it (and the tests that do the same) find every object."""
    if html is None:
        html = ""
    lines = html_to_lines(html)
    page_chunks = [
        lines[i : i + LINES_PER_PAGE] for i in range(0, len(lines), LINES_PER_PAGE)
    ]
    n_pages = len(page_chunks)

    # objects[i] = body of object i+1 (bytes between "N 0 obj" and "endobj")
    objects: list[bytes] = []
    first_page_obj = 4
    kids = " ".join(
        f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages)
    )
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, chunk in enumerate(page_chunks):
        page_num = first_page_obj + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {page_num + 1} 0 R >>"
            ).encode()
        )
        stream = _content_stream(chunk)
        objects.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")  # binary-marker comment
    offsets: list[int] = []
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)
