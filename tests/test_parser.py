"""DocumentParser tests across formats, using hand-built fixture files."""

import asyncio
import io
import zipfile
from pathlib import Path

import pytest

from multimodal_rag_tpu.ingest.parser import (
    DocumentParser,
    extract_markdown_tables,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


@pytest.fixture()
def parser(tmp_path):
    return DocumentParser(figures_dir=tmp_path / "figures", enable_ocr=False)


# ---------------------------------------------------------------------------
# Fixture builders
# ---------------------------------------------------------------------------

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"


def make_docx() -> bytes:
    document = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W_NS}"><w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Introduction</w:t></w:r></w:p>
<w:p><w:r><w:t>This document explains machine learning. </w:t></w:r><w:r><w:t>It has several parts.</w:t></w:r></w:p>
<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Methods</w:t></w:r></w:p>
<w:p><w:r><w:t>We used neural networks.</w:t></w:r></w:p>
<w:tbl>
<w:tr><w:tc><w:p><w:r><w:t>Model</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>Accuracy</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>MLP</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>0.92</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>CNN</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>0.97</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
</w:body></w:document>"""
    styles = f"""<?xml version="1.0"?>
<w:styles xmlns:w="{W_NS}">
<w:style w:styleId="Heading1"><w:name w:val="Heading 1"/></w:style>
<w:style w:styleId="Heading2"><w:name w:val="Heading 2"/></w:style>
</w:styles>"""
    png = make_png()
    rels = f"""<?xml version="1.0"?>
<Relationships xmlns="{REL_NS}">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/image1.png"/>
</Relationships>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", document)
        zf.writestr("word/styles.xml", styles)
        zf.writestr("word/_rels/document.xml.rels", rels)
        zf.writestr("word/media/image1.png", png)
    return buf.getvalue()


def make_pptx() -> bytes:
    slide1 = f"""<?xml version="1.0"?>
<p:sld xmlns:p="{P_NS}" xmlns:a="{A_NS}" xmlns:r="{R_NS}"><p:cSld><p:spTree>
<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
  <p:txBody><a:p><a:r><a:t>Deep Learning Overview</a:t></a:r></a:p></p:txBody></p:sp>
<p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
  <p:txBody><a:p><a:r><a:t>Backprop trains networks.</a:t></a:r></a:p></p:txBody></p:sp>
<p:graphicFrame><a:graphic><a:graphicData><a:tbl>
<a:tr><a:tc><a:txBody><a:p><a:r><a:t>Layer</a:t></a:r></a:p></a:txBody></a:tc>
      <a:tc><a:txBody><a:p><a:r><a:t>Units</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
<a:tr><a:tc><a:txBody><a:p><a:r><a:t>hidden</a:t></a:r></a:p></a:txBody></a:tc>
      <a:tc><a:txBody><a:p><a:r><a:t>128</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
</a:tbl></a:graphicData></a:graphic></p:graphicFrame>
<p:pic><p:blipFill><a:blip r:embed="rId2"/></p:blipFill></p:pic>
</p:spTree></p:cSld></p:sld>"""
    slide2 = f"""<?xml version="1.0"?>
<p:sld xmlns:p="{P_NS}" xmlns:a="{A_NS}"><p:cSld><p:spTree>
<p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
  <p:txBody><a:p><a:r><a:t>Second slide content.</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""
    notes1 = f"""<?xml version="1.0"?>
<p:notes xmlns:p="{P_NS}" xmlns:a="{A_NS}"><p:cSld><p:spTree>
<p:sp><p:txBody><a:p><a:r><a:t>Remember to mention GPUs.</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:notes>"""
    rels1 = f"""<?xml version="1.0"?>
<Relationships xmlns="{REL_NS}">
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="../media/image1.png"/>
</Relationships>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", slide1)
        zf.writestr("ppt/slides/slide2.xml", slide2)
        zf.writestr("ppt/notesSlides/notesSlide1.xml", notes1)
        zf.writestr("ppt/slides/_rels/slide1.xml.rels", rels1)
        zf.writestr("ppt/media/image1.png", make_png())
    return buf.getvalue()


def make_png(size=(64, 64)) -> bytes:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG")
    return buf.getvalue()


def make_pdf() -> bytes:
    stream = (
        b"BT /F1 12 Tf 72 720 Td (Alpha page one text.) Tj "
        b"0 -20 Td (More on page one.) Tj ET"
    )
    stream2 = b"BT /F1 12 Tf 72 720 Td (Beta page two text.) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 7 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream2), stream2),
    ]
    pdf = b"%PDF-1.4\n"
    for i, o in enumerate(objs, 1):
        pdf += b"%d 0 obj\n%s\nendobj\n" % (i, o)
    return pdf + b"trailer\n<< /Root 1 0 R >>\n%%EOF"


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


class TestRouting:
    def test_doc_id_and_metadata(self, parser):
        res = run(parser.parse_document(b"hello world", "notes.txt"))
        assert res["doc_type"] == "text"
        assert res["metadata"]["size_bytes"] == 11
        assert res["metadata"]["chunk_count"] == 1
        assert res["doc_id"].startswith("notes_")

    def test_custom_doc_id(self, parser):
        res = run(
            parser.parse_document(b"hi", "a.txt", doc_id="doc_custom123")
        )
        assert res["doc_id"] == "doc_custom123"
        assert res["text_chunks"][0]["chunk_id"].startswith("doc_custom123_chunk_0_")

    def test_unknown_type_falls_to_text(self, parser):
        res = run(parser.parse_document(b"some data", "file.xyz"))
        assert res["doc_type"] == "text"


class TestText:
    def test_markdown_tables(self, parser):
        md = (
            "# Title\n\nIntro paragraph.\n\n"
            "| Name | Score |\n|------|-------|\n| a | 1 |\n| b | 2 |\n\n"
            "Closing text.\n"
        )
        res = run(parser.parse_document(md.encode(), "doc.md"))
        assert len(res["tables"]) == 1
        table = res["tables"][0]
        assert table["metadata"]["columns"] == ["Name", "Score"]
        assert table["metadata"]["row_count"] == 2
        assert "| a" in table["content"] or "a " in table["content"]
        assert table["summary"].startswith("Table: 2 rows")

    def test_latin1_fallback(self, parser):
        res = run(parser.parse_document(b"caf\xe9 text", "a.txt"))
        assert "caf" in res["text_chunks"][0]["content"]

    def test_extract_markdown_tables_fn(self):
        tables = extract_markdown_tables(
            "| a | b |\n| --- | --- |\n| 1 | 2 |\n"
        )
        assert tables == [[["a", "b"], ["1", "2"]]]


class TestDocx:
    def test_sections_and_headings(self, parser):
        res = run(parser.parse_document(make_docx(), "report.docx"))
        assert res["doc_type"] == "docx"
        heads = res["document_structure"]["headings"]
        assert {"text": "Introduction", "level": 1} in heads
        assert {"text": "Methods", "level": 2} in heads
        sections = {c["metadata"]["section"] for c in res["text_chunks"]}
        assert sections == {"Introduction", "Methods"}

    def test_tables(self, parser):
        res = run(parser.parse_document(make_docx(), "report.docx"))
        assert len(res["tables"]) == 1
        t = res["tables"][0]
        assert t["metadata"]["columns"] == ["Model", "Accuracy"]
        assert t["raw_data"] == [
            ["Model", "Accuracy"], ["MLP", "0.92"], ["CNN", "0.97"],
        ]
        assert "CNN" in t["content"]

    def test_images_saved(self, parser, tmp_path):
        res = run(parser.parse_document(make_docx(), "report.docx"))
        assert len(res["images"]) == 1
        img = res["images"][0]
        assert img["metadata"]["format"] == "PNG"
        assert (tmp_path / "figures").glob("report_image_0.png")
        assert img["base64"]


class TestPptx:
    def test_slides_and_title(self, parser):
        res = run(parser.parse_document(make_pptx(), "deck.pptx"))
        assert res["doc_type"] == "pptx"
        assert res["document_structure"]["total_slides"] == 2
        chunk0 = res["text_chunks"][0]["content"]
        assert chunk0.startswith("## Slide 1")
        assert "# Deep Learning Overview" in chunk0
        assert "Backprop trains networks." in chunk0
        assert "**Speaker Notes:**" in chunk0
        assert "Remember to mention GPUs." in chunk0

    def test_slide_table_and_image(self, parser):
        res = run(parser.parse_document(make_pptx(), "deck.pptx"))
        assert len(res["tables"]) == 1
        assert res["tables"][0]["id"] == "slide_1_table_0"
        assert res["tables"][0]["metadata"]["columns"] == ["Layer", "Units"]
        assert len(res["images"]) == 1
        assert res["images"][0]["id"] == "slide_1_image_0"
        assert res["images"][0]["metadata"]["slide"] == 1

    def test_slide2_chunk_metadata(self, parser):
        res = run(parser.parse_document(make_pptx(), "deck.pptx"))
        slide2_chunks = [
            c for c in res["text_chunks"] if c["metadata"]["slide"] == 2
        ]
        assert slide2_chunks
        assert "Second slide content." in slide2_chunks[0]["content"]


class TestPdf:
    def test_text_pages(self, parser):
        res = run(parser.parse_document(make_pdf(), "paper.pdf"))
        assert res["doc_type"] == "pdf"
        assert res["document_structure"]["total_pages"] == 2
        text = " ".join(c["content"] for c in res["text_chunks"])
        assert "Alpha page one text." in text
        assert "Beta page two text." in text
        assert res["text_chunks"][0]["metadata"]["page"] == 1

    def test_matplotlib_pdf(self, parser):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        fig.text(0.1, 0.5, "Generated content for extraction.")
        buf = io.BytesIO()
        fig.savefig(buf, format="pdf")
        plt.close(fig)
        res = run(parser.parse_document(buf.getvalue(), "gen.pdf"))
        text = " ".join(c["content"] for c in res["text_chunks"])
        assert "Generated content for extraction." in text


class TestHtml:
    HTML = b"""<html><head><style>p{color:red}</style>
<script>alert(1)</script></head><body>
<nav>Menu items</nav>
<h1>Main Title</h1><p>Body paragraph about learning.</p>
<h2>Sub Heading</h2><p>More details follow here.</p>
<table><tr><th>x</th><th>y</th></tr><tr><td>1</td><td>2</td></tr></table>
<footer>footer text</footer>
</body></html>"""

    def test_structure_and_text(self, parser):
        res = run(parser.parse_document(self.HTML, "page.html"))
        assert res["doc_type"] == "html"
        heads = res["document_structure"]["headings"]
        assert {"text": "Main Title", "level": 1} in heads
        text = res["text_chunks"][0]["content"]
        assert "Body paragraph about learning." in text
        assert "alert" not in text  # script stripped
        assert "Menu items" not in text  # nav stripped

    def test_table(self, parser):
        res = run(parser.parse_document(self.HTML, "page.html"))
        assert len(res["tables"]) == 1
        assert res["tables"][0]["metadata"]["columns"] == ["x", "y"]

    def test_data_uri_image(self, parser, tmp_path):
        import base64 as b64

        html = (
            b'<html><body><img src="data:image/png;base64,'
            + b64.b64encode(make_png((80, 80)))
            + b'" alt="chart"></body></html>'
        )
        res = run(parser.parse_document(html, "img.html"))
        assert len(res["images"]) == 1
        assert res["images"][0]["metadata"]["alt"] == "chart"


class TestImage:
    def test_image_upload(self, parser):
        res = run(
            parser.parse_document(make_png(), "photo.png", content_type="image/png")
        )
        assert res["doc_type"] == "image"
        assert len(res["images"]) == 1
        img = res["images"][0]
        assert img["metadata"]["size"] == (64, 64)
        assert img["id"] == "image_0"


# ---------------------------------------------------------------------------
# PDF page rasterization + OCR gating (VERDICT r1 #1, #10) and parser-level
# LLM table summaries (VERDICT r1 #7)
# ---------------------------------------------------------------------------


def _fake_pdftoppm(tmp_path) -> str:
    """Executable stand-in for poppler's pdftoppm: honors -f/-l and writes
    a valid PNG per page to <prefix>-<n>.png."""
    script = tmp_path / "pdftoppm"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "from PIL import Image\n"
        "args = sys.argv[1:]\n"
        "lo = int(args[args.index('-f') + 1])\n"
        "hi = int(args[args.index('-l') + 1])\n"
        "prefix = args[-1]\n"
        "for n in range(lo, hi + 1):\n"
        "    Image.new('RGB', (60, 60), (255, 255, 255)).save(\n"
        "        f'{prefix}-{n}.png')\n"
    )
    script.chmod(0o755)
    return str(script)


def _fake_tesseract(tmp_path) -> str:
    script = tmp_path / "tesseract"
    script.write_text("#!/bin/sh\necho 'scanned page text'\n")
    script.chmod(0o755)
    return str(script)


class TestPdfPageRasterization:
    def test_pages_rendered_and_ocrd(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.ingest import parser as parser_mod

        monkeypatch.setattr(parser_mod, "PDFTOPPM", _fake_pdftoppm(tmp_path))
        monkeypatch.setattr(parser_mod, "TESSERACT", _fake_tesseract(tmp_path))
        p = parser_mod.DocumentParser(
            figures_dir=tmp_path / "figs",
            convert_pdf_pages_to_images=True,
            enable_ocr=True,
        )
        res = run(p.parse_document(make_pdf(), "scan.pdf"))
        page_imgs = [
            i for i in res["images"]
            if i["metadata"].get("type") == "page_screenshot"
        ]
        assert len(page_imgs) == 2  # both pages of the fixture PDF
        # Reference naming flavor: {stem}_page_{n}_{hash8}.png
        import re as _re

        for img in page_imgs:
            assert _re.search(r"scan_page_\d+_[0-9a-f]{8}\.png$", img["path"])
            assert (tmp_path / "figs" / Path(img["path"]).name).exists()
        # Per-page OCR became text chunks (the only text path for scans).
        ocr_chunks = [
            c for c in res["text_chunks"] if c["metadata"].get("from_ocr")
        ]
        assert len(ocr_chunks) == 2
        assert "scanned page text" in ocr_chunks[0]["content"]

    def test_page_cap_respected(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.ingest import parser as parser_mod

        monkeypatch.setattr(parser_mod, "PDFTOPPM", _fake_pdftoppm(tmp_path))
        p = parser_mod.DocumentParser(
            figures_dir=tmp_path / "figs",
            convert_pdf_pages_to_images=True,
            max_pdf_pages_as_images=1,
            enable_ocr=False,
        )
        res = run(p.parse_document(make_pdf(), "scan.pdf"))
        page_imgs = [
            i for i in res["images"]
            if i["metadata"].get("type") == "page_screenshot"
        ]
        assert len(page_imgs) == 1

    def test_no_binary_gates_cleanly(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.ingest import parser as parser_mod

        monkeypatch.setattr(parser_mod, "PDFTOPPM", None)
        p = parser_mod.DocumentParser(
            figures_dir=tmp_path / "figs",
            convert_pdf_pages_to_images=True,
            enable_ocr=False,
        )
        res = run(p.parse_document(make_pdf(), "doc.pdf"))
        assert not [
            i for i in res["images"]
            if i["metadata"].get("type") == "page_screenshot"
        ]
        assert res["text_chunks"]  # embedded text still extracted

    def test_knob_off_skips_rendering(self, tmp_path, monkeypatch):
        from multimodal_rag_tpu.ingest import parser as parser_mod

        calls = []

        def boom(*a, **k):
            calls.append(a)
            return []

        monkeypatch.setattr(parser_mod, "PDFTOPPM", "/usr/bin/true")
        monkeypatch.setattr(parser_mod, "render_pdf_pages", boom)
        p = parser_mod.DocumentParser(
            figures_dir=tmp_path / "figs",
            convert_pdf_pages_to_images=False,
            enable_ocr=False,
        )
        run(p.parse_document(make_pdf(), "doc.pdf"))
        assert calls == []


class TestOcrEdgeGate:
    def _png(self, arr) -> bytes:
        import numpy as np
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr.astype("uint8"), "L").save(buf, "PNG")
        return buf.getvalue()

    def test_texty_image_passes(self):
        import numpy as np

        from multimodal_rag_tpu.ingest.parser import image_has_text

        # High-frequency stripes ≈ dense text edges.
        arr = np.zeros((120, 120))
        arr[:, ::3] = 255
        assert image_has_text(self._png(arr))

    def test_smooth_photo_skipped(self):
        import numpy as np

        from multimodal_rag_tpu.ingest.parser import image_has_text

        # Smooth gradient ≈ photo with no text.
        arr = np.linspace(0, 255, 120)[None, :].repeat(120, axis=0)
        assert not image_has_text(self._png(arr))

    def test_embedded_ocr_gated(self, tmp_path, monkeypatch):
        """A smooth embedded image must not reach tesseract."""
        from multimodal_rag_tpu.ingest import parser as parser_mod

        ocr_calls = []
        monkeypatch.setattr(parser_mod, "TESSERACT", "/usr/bin/true")
        monkeypatch.setattr(
            parser_mod, "ocr_image_bytes",
            lambda data: ocr_calls.append(1) or "",
        )
        monkeypatch.setattr(
            parser_mod, "image_has_text", lambda data: False
        )
        p = parser_mod.DocumentParser(
            figures_dir=tmp_path / "figs",
            convert_pdf_pages_to_images=False,
            enable_ocr=True,
        )
        run(p.parse_document(make_pdf(), "doc.pdf"))
        assert ocr_calls == []


class TestParserTableSummaries:
    def _md_tables(self, n) -> bytes:
        parts = ["# Doc\n"]
        for i in range(n):
            parts.append(
                f"| h{i} | v |\n|----|----|\n| a{i} | {i} |\n| b{i} | {i} |\n"
            )
        return "\n".join(parts).encode()

    def test_adapter_summarizes_tables(self, tmp_path):
        from multimodal_rag_tpu.ingest.parser import DocumentParser
        from multimodal_rag_tpu.models.adapters.fake import FakeLLMAdapter

        fake = FakeLLMAdapter()
        p = DocumentParser(
            figures_dir=tmp_path / "figs", llm_adapter=fake, enable_ocr=False
        )
        res = run(p.parse_document(self._md_tables(3), "t.md"))
        assert len(res["tables"]) == 3
        summarize_calls = [
            c for c in fake.calls if c["kind"] == "summarize"
        ]
        assert len(summarize_calls) == 3
        assert all(
            t["metadata"].get("llm_summary") for t in res["tables"]
        )

    def test_cap_at_20(self, tmp_path):
        from multimodal_rag_tpu.ingest.parser import DocumentParser
        from multimodal_rag_tpu.models.adapters.fake import FakeLLMAdapter

        fake = FakeLLMAdapter()
        p = DocumentParser(
            figures_dir=tmp_path / "figs", llm_adapter=fake, enable_ocr=False
        )
        res = run(p.parse_document(self._md_tables(25), "t.md"))
        assert len(res["tables"]) == 25
        summarize_calls = [
            c for c in fake.calls if c["kind"] == "summarize"
        ]
        assert len(summarize_calls) == 20  # reference cap (parser.py:689)

    def test_no_adapter_keeps_heuristic(self, tmp_path):
        from multimodal_rag_tpu.ingest.parser import DocumentParser

        p = DocumentParser(figures_dir=tmp_path / "figs", enable_ocr=False)
        res = run(p.parse_document(self._md_tables(1), "t.md"))
        assert res["tables"][0]["summary"]  # heuristic summary present
        assert not res["tables"][0]["metadata"].get("llm_summary")

    def test_adapter_failure_keeps_heuristic(self, tmp_path):
        from multimodal_rag_tpu.ingest.parser import DocumentParser
        from multimodal_rag_tpu.models.adapters.fake import FakeLLMAdapter

        fake = FakeLLMAdapter(fail_times=99)  # every call raises
        p = DocumentParser(
            figures_dir=tmp_path / "figs", llm_adapter=fake, enable_ocr=False
        )
        res = run(p.parse_document(self._md_tables(2), "t.md"))
        assert all(t["summary"] for t in res["tables"])


class TestParserHardening:
    """Regressions from the round-2 adversarial review of the first-party
    extractors."""

    def test_unterminated_hex_string_terminates(self):
        """A '<' with no closing '>' must not rewind the lexer to 0 and
        loop forever (single corrupt upload = permanent thread leak)."""
        from multimodal_rag_tpu.ingest.pdfparse import Lexer

        lex = Lexer(b"<48656c6c6f")  # no '>'
        out = lex.parse_object()
        assert out == b"Hello"
        assert lex.pos >= len(lex.data)  # consumed to EOF, no rewind

    def test_bfrange_array_entries_not_double_counted(self):
        """Array-form bfrange entries must not ALSO match the plain
        three-hex regex and mint bogus range mappings."""
        from multimodal_rag_tpu.ingest.pdfparse import _parse_tounicode

        cmap = (
            b"beginbfchar\n<0041> <0058>\nendbfchar\n"
            b"beginbfrange\n"
            b"<0000> <0002> [<0041> <0042> <0043>]\n"
            b"endbfrange\n"
        )
        m = _parse_tounicode(cmap)
        assert m[0x0000] == "A" and m[0x0001] == "B" and m[0x0002] == "C"
        # The bfchar entry for 0x41 must survive: the array's inner
        # '<0041> <0042> <0043>' must NOT be read as a range mapping.
        assert m[0x0041] == "X"
        assert 0x0042 not in m  # no bogus spillover

    def test_cyclic_outline_does_not_recurse_forever(self):
        """A /First chain that loops back must terminate, and a broken
        outline must not sink a document whose pages parsed fine."""
        from multimodal_rag_tpu.ingest.pdfparse import extract_pdf

        # Minimal PDF with an outline whose /First points at itself.
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R /Outlines 4 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R "
            b"/MediaBox [0 0 612 792] >> endobj\n"
            b"4 0 obj << /Type /Outlines /First 5 0 R >> endobj\n"
            b"5 0 obj << /Title (Loop) /First 5 0 R /Next 5 0 R >> endobj\n"
            b"trailer << /Root 1 0 R >>\n%%EOF\n"
        )
        res = extract_pdf(pdf)
        assert res["page_count"] == 1  # parse survived the cycle

    def test_docx_heading_only_sections_kept(self):
        """A heading immediately followed by another heading must still
        surface as a section (its text reaches the chunker)."""
        from multimodal_rag_tpu.ingest.office import parse_docx_bytes

        document = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W_NS}"><w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Alpha</w:t></w:r></w:p>
<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Beta</w:t></w:r></w:p>
<w:p><w:r><w:t>Body under beta.</w:t></w:r></w:p>
</w:body></w:document>"""
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", document)
        res = parse_docx_bytes(buf.getvalue())
        heads = [sec["heading"] for sec in res["sections"]]
        assert "Alpha" in heads  # heading-only section survives
        assert "Beta" in heads

    def test_malformed_ooxml_raises_valueerror(self):
        """The documented contract: corrupt archives/XML -> ValueError,
        not BadZipFile / ParseError leaking through."""
        from multimodal_rag_tpu.ingest.office import (
            parse_docx_bytes,
            parse_pptx_bytes,
        )

        with pytest.raises(ValueError):
            parse_docx_bytes(b"not a zip archive at all")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", "<w:document not xml")
        with pytest.raises(ValueError):
            parse_docx_bytes(buf.getvalue())
        with pytest.raises(ValueError):
            parse_pptx_bytes(b"PK corrupt")
