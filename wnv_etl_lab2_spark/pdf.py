"""Minimal dependency-free PDF writer + map export (reference O19/O20).

The reference pipeline ends with `arcpy.mp` styling (red fill, black
outline, 50% transparency — `final_project2.py:183-210`) and
`exportToPDF` (`final_project2.py:146-168`). No PDF library exists in
this container, so this module writes the PDF file format directly —
header, numbered objects, a vector content stream, a byte-exact xref
table, and trailer (PDF 1.4, public ISO 32000 basics). The map is a
true vector rendering: risk-zone rectangles with the reference's
styling (50% alpha via an ExtGState), target-address points, and a
title line, scaled from data coordinates into the page box.

Presentation sinks are driver-side by nature (a map is a human
artifact, bounded rows); the data plane never flows through here.
"""

from __future__ import annotations

PAGE_W, PAGE_H = 612, 792  # US Letter, points
_MARGIN = 40
_TITLE_H = 50


def _esc(text: str) -> str:
    """Escape a PDF literal string. Characters outside Latin-1 (the
    encoding of the embedded standard-font text) degrade to '?' so an
    arbitrary title can never crash the export."""
    safe = text.encode("latin-1", errors="replace").decode("latin-1")
    return safe.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(content_stream: str) -> bytes:
    """Assemble a one-page PDF around a content stream: catalog,
    pages, page, contents, the 50%-alpha ExtGState, and Helvetica —
    with the xref table's byte offsets computed exactly."""
    stream = content_stream.encode("latin-1", errors="replace")
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Contents 4 0 R /Resources << /ExtGState << /GS0 5 0 R >> "
            f"/Font << /F1 6 0 R >> >> >>"
        ).encode(),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /ExtGState /ca 0.5 /CA 1 >>",  # 50% fill alpha (O19)
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


def map_content_stream(
    points: list[tuple[float, float]],
    zones: list[tuple[float, float, float, float]],
    title: str,
) -> str:
    """Vector drawing ops for the spray-target map: red zone boxes
    with black outline at 50% fill alpha (the reference renderer's
    exact styling), black 2x2pt address points, and a title."""
    xs = [p[0] for p in points] + [z[0] for z in zones] + [z[2] for z in zones]
    ys = [p[1] for p in points] + [z[1] for z in zones] + [z[3] for z in zones]
    x0, x1 = (min(xs), max(xs)) if xs else (0.0, 1.0)
    y0, y1 = (min(ys), max(ys)) if ys else (0.0, 1.0)
    sx = (PAGE_W - 2 * _MARGIN) / max(x1 - x0, 1e-12)
    sy = (PAGE_H - 2 * _MARGIN - _TITLE_H) / max(y1 - y0, 1e-12)
    s = min(sx, sy)

    def px(x: float) -> float:
        return _MARGIN + (x - x0) * s

    def py(y: float) -> float:
        return _MARGIN + (y - y0) * s

    ops = [f"BT /F1 14 Tf {_MARGIN} {PAGE_H - 30} Td ({_esc(title)}) Tj ET"]
    for zx0, zy0, zx1, zy1 in zones:
        ops.append(
            f"q /GS0 gs 1 0 0 rg 0 0 0 RG 1 w "
            f"{px(zx0):.2f} {py(zy0):.2f} {(zx1 - zx0) * s:.2f} {(zy1 - zy0) * s:.2f} re B Q"
        )
    for x, y in points:
        ops.append(f"0 0 0 rg {px(x) - 1:.2f} {py(y) - 1:.2f} 2 2 re f")
    return "\n".join(ops)
