"""PDF table extraction: layout interpreter + lattice/text strategies.

Mirrors the reference's pdfplumber table stage (app/utils/parser.py:615-716)
on the first-party geometry layer (ingest/pdfparse.py + ingest/pdftables.py).
"""

import asyncio

import pytest

from multimodal_rag_tpu.ingest import pdfparse, pdftables
from multimodal_rag_tpu.ingest.parser import DocumentParser


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture
def parser(tmp_path):
    return DocumentParser(figures_dir=tmp_path / "figures", enable_ocr=False)


def build_pdf(stream: bytes) -> bytes:
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    pdf = b"%PDF-1.4\n"
    for i, o in enumerate(objs, 1):
        pdf += b"%d 0 obj\n%s\nendobj\n" % (i, o)
    return pdf + b"trailer\n<< /Root 1 0 R >>\n%%EOF"


def text_at(x: int, y: int, s: bytes, size: int = 12) -> bytes:
    return b"BT /F1 %d Tf %d %d Td (%s) Tj ET " % (size, x, y, s)


def line(x0: int, y0: int, x1: int, y1: int) -> bytes:
    return b"%d %d m %d %d l S " % (x0, y0, x1, y1)


def ruled_grid_pdf() -> bytes:
    """2x2 ruled grid with header+data text in the cells."""
    stream = b""
    # horizontal rules at y = 700, 675, 650; vertical at x = 100, 250, 400
    for y in (700, 675, 650):
        stream += line(100, y, 400, y)
    for x in (100, 250, 400):
        stream += line(x, 650, x, 700)
    stream += text_at(110, 683, b"Metric")
    stream += text_at(260, 683, b"Value")
    stream += text_at(110, 658, b"Latency")
    stream += text_at(260, 658, b"5 ms")
    return build_pdf(stream)


def aligned_text_pdf() -> bytes:
    """No rules: four rows with three aligned columns, plus prose."""
    stream = text_at(72, 740, b"Report of quarterly results.")
    rows = [
        (b"Name", b"Qty", b"Price"),
        (b"Widget", b"12", b"3.50"),
        (b"Gadget", b"7", b"9.99"),
        (b"Sprocket", b"40", b"0.25"),
    ]
    for i, (a, b_, c) in enumerate(rows):
        y = 700 - 20 * i
        stream += text_at(72, y, a) + text_at(220, y, b_) + text_at(360, y, c)
    stream += text_at(72, 560, b"Closing paragraph of prose text.")
    return build_pdf(stream)


class TestLayoutInterpreter:
    def test_spans_positions(self):
        doc = pdfparse.PDFDocument(build_pdf(text_at(72, 700, b"Hello")))
        layout = pdfparse.extract_page_layout(doc, doc.pages()[0])
        assert len(layout["spans"]) == 1
        s = layout["spans"][0]
        assert abs(s.x0 - 72) < 0.5 and abs(s.y - 700) < 0.5
        assert s.text == "Hello"
        assert s.x1 > s.x0

    def test_rules_collected(self):
        doc = pdfparse.PDFDocument(ruled_grid_pdf())
        layout = pdfparse.extract_page_layout(doc, doc.pages()[0])
        h = [r for r in layout["rules"] if r.horizontal]
        v = [r for r in layout["rules"] if r.vertical]
        assert len(h) == 3 and len(v) == 3

    def test_ctm_transform(self):
        # 10 0 0 10 50 50 cm scales text placed at (10, 10) to (150, 150).
        stream = b"q 10 0 0 10 50 50 cm " + text_at(10, 10, b"X") + b"Q "
        doc = pdfparse.PDFDocument(build_pdf(stream))
        layout = pdfparse.extract_page_layout(doc, doc.pages()[0])
        s = layout["spans"][0]
        assert abs(s.x0 - 150) < 1 and abs(s.y - 150) < 1
        assert abs(s.size - 120) < 1  # 12pt font under 10x scale


class TestLattice:
    def test_ruled_grid(self):
        doc = pdfparse.PDFDocument(ruled_grid_pdf())
        layout = pdfparse.extract_page_layout(doc, doc.pages()[0])
        tables = pdftables.detect_tables(layout)
        assert tables == [[["Metric", "Value"], ["Latency", "5 ms"]]]


class TestTextAligned:
    def test_aligned_columns(self):
        doc = pdfparse.PDFDocument(aligned_text_pdf())
        layout = pdfparse.extract_page_layout(doc, doc.pages()[0])
        tables = pdftables.detect_tables(layout)
        assert len(tables) == 1
        assert tables[0][0] == ["Name", "Qty", "Price"]
        assert tables[0][2] == ["Gadget", "7", "9.99"]
        assert len(tables[0]) == 4

    def test_prose_is_not_a_table(self):
        stream = b"".join(
            text_at(72, 700 - 20 * i, b"Just a line of plain prose here.")
            for i in range(6)
        )
        doc = pdfparse.PDFDocument(build_pdf(stream))
        layout = pdfparse.extract_page_layout(doc, doc.pages()[0])
        assert pdftables.detect_tables(layout) == []


class TestParserIntegration:
    def test_pdf_tables_in_parse_result(self, parser):
        res = run(parser.parse_document(ruled_grid_pdf(), "grid.pdf"))
        assert len(res["tables"]) == 1
        t = res["tables"][0]
        assert t["metadata"]["columns"] == ["Metric", "Value"]
        assert t["metadata"]["page"] == 1
        assert "Latency" in t["content"]  # markdown render
        assert t["summary"].startswith("Table: 1 rows")

    def test_text_table_in_parse_result(self, parser):
        res = run(parser.parse_document(aligned_text_pdf(), "rows.pdf"))
        assert len(res["tables"]) == 1
        assert res["tables"][0]["metadata"]["columns"] == [
            "Name", "Qty", "Price",
        ]
