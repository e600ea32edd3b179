"""Document parser: format routing + extraction to the parsed-document
contract.

Behavioral counterpart of the reference's ``DocumentParser``
(``app/utils/parser.py``, SURVEY.md §2.2): bytes + filename →

    {doc_id, filename, doc_type, metadata,
     text_chunks: [{chunk_id, content, metadata}],
     tables: [{id, content(markdown), raw_data, summary, metadata}],
     images: [{id, path, base64, metadata}],
     document_structure: {...}}

Format support in this environment (third-party parser libs are absent, so
extraction is first-party code):

* PDF   — own extractor (``ingest.pdfparse``): text + outline + embedded
          images. Page rasterization + per-page OCR (reference's pdf2image
          @200 DPI, parser.py:521-613) runs through the poppler
          ``pdftoppm`` binary when present, gated the same way OCR gates
          on tesseract.
* DOCX/PPTX — stdlib zip+XML (``ingest.office``).
* HTML  — BeautifulSoup: strip script/style/nav/footer, heading outline,
          tables, images incl. data: URIs and async remote fetch.
* TXT/MD — decode fallback utf-8 → latin-1; markdown-table extraction.
* Images — saved to figures dir + base64; OCR runs when a tesseract binary
          exists (gated, as the reference gates on pytesseract).

Chunking delegates to ``ingest.chunking`` (reference-exact semantics).
"""

from __future__ import annotations

import asyncio
import base64
import logging
import mimetypes
import re
import shutil
import subprocess
import tempfile
import time
from datetime import datetime, timezone
from io import BytesIO
from pathlib import Path
from typing import Any, Dict, List, Optional

from multimodal_rag_tpu.config import settings
from multimodal_rag_tpu.ingest.chunking import (
    RecursiveTextSplitter,
    chunk_simple,
    chunk_structured,
    chunk_with_pages,
    enrich_chunks_metadata,
    generate_doc_id,
)
from multimodal_rag_tpu.ingest.tables import build_table_obj, clean_table
from multimodal_rag_tpu.ingest import office, pdfparse, pdftables

logger = logging.getLogger(__name__)

TESSERACT = shutil.which("tesseract")
PDFTOPPM = shutil.which("pdftoppm")

# Reference parser.py:689-711 caps parallel LLM table summaries at 20.
MAX_TABLE_SUMMARIES = 20
# Reference parser.py:521-613 renders pages in batches of 10 at 200 DPI.
PDF_PAGE_BATCH = 10
PDF_PAGE_DPI = 200


def image_has_text(data: bytes, edge_threshold: float = 0.10) -> bool:
    """Edge-density heuristic deciding whether an image is worth OCR'ing
    (reference ``parser.py:1845-1862`` used cv2 Canny with a >10% edge
    ratio; here PIL + numpy gradient magnitude — no cv2 dependency).
    Photos/gradients have few sharp edges; text and diagrams have many.
    Fails open (True) so OCR never silently disappears on odd inputs."""
    try:
        import numpy as np
        from PIL import Image

        img = Image.open(BytesIO(data)).convert("L")
        img.thumbnail((512, 512))
        a = np.asarray(img, np.float32)
        if a.size == 0:
            return True
        gx = np.abs(np.diff(a, axis=1))
        gy = np.abs(np.diff(a, axis=0))
        edges = (gx[:-1, :] > 40.0) | (gy[:, :-1] > 40.0)
        return float(edges.mean()) > edge_threshold
    except Exception:  # noqa: BLE001 — heuristic only
        return True


def render_pdf_pages(
    content: bytes, first: int, last: int, dpi: int = PDF_PAGE_DPI
) -> List[tuple]:
    """Rasterize PDF pages [first, last] (1-based) via the poppler
    ``pdftoppm`` binary → [(page_number, png_bytes)]. Empty when the
    binary is absent or rendering fails (same external-tool gating as
    OCR/tesseract; the reference gated on poppler via pdf2image)."""
    if not PDFTOPPM:
        return []
    try:
        with tempfile.TemporaryDirectory() as td:
            pdf_path = Path(td) / "doc.pdf"
            pdf_path.write_bytes(content)
            prefix = Path(td) / "page"
            subprocess.run(
                [
                    PDFTOPPM, "-png", "-r", str(dpi),
                    "-f", str(first), "-l", str(last),
                    str(pdf_path), str(prefix),
                ],
                capture_output=True, timeout=300,
            )
            out = []
            for f in Path(td).iterdir():
                m = re.fullmatch(r"page-(\d+)\.png", f.name)
                if m:
                    out.append((int(m.group(1)), f.read_bytes()))
            return sorted(out)
    except Exception as e:  # noqa: BLE001
        logger.warning("pdftoppm rendering failed: %s", e)
        return []


def ocr_image_bytes(data: bytes) -> str:
    """OCR via the tesseract binary when present (reference used
    pytesseract, parser.py:487; same gating semantics)."""
    if not TESSERACT:
        return ""
    try:
        with tempfile.NamedTemporaryFile(suffix=".png") as tmp:
            from PIL import Image

            Image.open(BytesIO(data)).convert("RGB").save(tmp.name, "PNG")
            proc = subprocess.run(
                [TESSERACT, tmp.name, "-", "-l", "eng+vie"],
                capture_output=True, timeout=60,
            )
            return proc.stdout.decode("utf-8", errors="replace").strip()
    except Exception as e:  # noqa: BLE001
        logger.debug("OCR failed: %s", e)
        return ""


class DocumentParser:
    def __init__(
        self,
        chunk_size: int = None,
        chunk_overlap: int = None,
        figures_dir: Optional[Path] = None,
        extract_pdf_embedded_images: bool = None,
        convert_pdf_pages_to_images: bool = None,
        max_pdf_pages_as_images: int = None,
        enable_ocr: bool = None,
        llm_adapter=None,
        mllm_adapter=None,
    ) -> None:
        self.chunk_size = chunk_size or settings.CHUNK_SIZE
        self.chunk_overlap = (
            chunk_overlap if chunk_overlap is not None else settings.CHUNK_OVERLAP
        )
        self.figures_dir = Path(figures_dir or settings.FIGURES_DIR)
        self.figures_dir.mkdir(parents=True, exist_ok=True)
        self.extract_pdf_embedded_images = (
            settings.EXTRACT_PDF_EMBEDDED_IMAGES
            if extract_pdf_embedded_images is None
            else extract_pdf_embedded_images
        )
        self.convert_pdf_pages_to_images = (
            settings.CONVERT_PDF_PAGES_TO_IMAGES
            if convert_pdf_pages_to_images is None
            else convert_pdf_pages_to_images
        )
        self.max_pdf_pages_as_images = (
            max_pdf_pages_as_images or settings.MAX_PDF_PAGES_AS_IMAGES
        )
        self.enable_ocr = (
            settings.ENABLE_OCR if enable_ocr is None else enable_ocr
        ) and TESSERACT is not None
        self.llm_adapter = llm_adapter
        self.mllm_adapter = mllm_adapter
        self.splitter = RecursiveTextSplitter(
            self.chunk_size, self.chunk_overlap
        )

    # ------------------------------------------------------------------
    # Entry (reference parser.py:188-300)
    # ------------------------------------------------------------------

    async def parse_document(
        self,
        content: bytes,
        filename: str,
        content_type: Optional[str] = None,
        base_url: Optional[str] = None,
        doc_id: Optional[str] = None,
    ) -> Dict[str, Any]:
        if not content_type:
            content_type, _ = mimetypes.guess_type(filename)
        if not doc_id:
            doc_id = generate_doc_id(content, filename)
        logger.info("Parsing %s (type=%s, id=%s)", filename, content_type, doc_id)

        if content_type == "application/pdf" or filename.endswith(".pdf"):
            result = await asyncio.to_thread(self._parse_pdf, content, filename)
            doc_type = "pdf"
        elif content_type in (
            "application/vnd.openxmlformats-officedocument."
            "wordprocessingml.document",
            "application/msword",
        ) or filename.endswith((".docx", ".doc")):
            result = await asyncio.to_thread(self._parse_docx, content, filename)
            doc_type = "docx"
        elif content_type in (
            "application/vnd.openxmlformats-officedocument."
            "presentationml.presentation",
            "application/vnd.ms-powerpoint",
        ) or filename.endswith((".pptx", ".ppt")):
            result = await asyncio.to_thread(self._parse_pptx, content, filename)
            doc_type = "pptx"
        elif content_type == "text/html" or filename.endswith((".html", ".htm")):
            result = await self._parse_html(content, filename, base_url)
            doc_type = "html"
        elif content_type and content_type.startswith("image/"):
            result = await asyncio.to_thread(self._parse_image, content, filename)
            doc_type = "image"
        else:
            if not (content_type and content_type.startswith("text/")):
                logger.warning(
                    "Unknown content type %s; trying as text", content_type
                )
            result = self._parse_text(content, filename)
            doc_type = "text"

        if result.get("tables"):
            await self._summarize_tables_llm(result["tables"])

        result["doc_id"] = doc_id
        result["filename"] = filename
        result["doc_type"] = doc_type
        result["metadata"] = {
            "parsed_at": datetime.now(timezone.utc).isoformat(),
            "content_type": content_type,
            "size_bytes": len(content),
            "chunk_count": len(result.get("text_chunks", [])),
            "table_count": len(result.get("tables", [])),
            "image_count": len(result.get("images", [])),
        }
        result["text_chunks"] = enrich_chunks_metadata(
            result.get("text_chunks", []), doc_id, filename, doc_type
        )
        logger.info(
            "Parsed %s: %d chunks, %d tables, %d images",
            filename,
            len(result["text_chunks"]),
            len(result.get("tables", [])),
            len(result.get("images", [])),
        )
        return result

    # ------------------------------------------------------------------
    # PDF (reference parser.py:305-613)
    # ------------------------------------------------------------------

    def _parse_pdf(self, content: bytes, filename: str) -> Dict[str, Any]:
        extracted = pdfparse.extract_pdf(content, include_layout=True)
        total_pages = extracted["page_count"]

        text_chunks = chunk_with_pages(
            [p for p in extracted["pages"] if p["text"]],
            filename,
            total_pages,
            self.splitter,
        )

        # Geometry-based table extraction (reference parser.py:615-716 via
        # pdfplumber; here via the first-party layout interpreter).
        tables: List[Dict[str, Any]] = []
        for p in extracted["pages"]:
            layout = p.get("layout")
            if not layout:
                continue
            for rows in pdftables.detect_tables(layout):
                obj = build_table_obj(
                    f"table_{len(tables)}",
                    clean_table(rows),
                    {
                        "source": filename,
                        "page": p["page"],
                        "table_index": len(tables),
                    },
                )
                if obj:
                    tables.append(obj)

        images: List[Dict[str, Any]] = []
        if self.extract_pdf_embedded_images:
            stem = Path(filename).stem
            for count, (page_num, data, ext, size) in enumerate(
                extracted["images"]
            ):
                if size[0] < 50 or size[1] < 50:  # icons (parser.py:466-468)
                    continue
                img_path = self.figures_dir / f"{stem}_embedded_{count}.{ext}"
                img_path.write_bytes(data)
                ocr_text = ""
                # Edge-density gate (reference parser.py:1845-1862): skip
                # tesseract on photos with no text-like structure.
                if self.enable_ocr and image_has_text(data):
                    ocr_text = ocr_image_bytes(data)
                images.append(
                    {
                        "id": f"embedded_{count}",
                        "path": str(img_path),
                        "base64": base64.b64encode(data).decode(),
                        "metadata": {
                            "source": filename,
                            "page": page_num,
                            "type": "embedded",
                            "format": ext.upper(),
                            "size": size,
                            "ocr_text": ocr_text or None,
                        },
                    }
                )

        # Page rasterization + per-page OCR (reference parser.py:521-613):
        # renders up to MAX_PDF_PAGES_AS_IMAGES pages at 200 DPI in batches
        # of 10 and OCRs every page — the only text path for scanned PDFs
        # and the source of the reference's shipped figures/ corpus.
        if self.convert_pdf_pages_to_images and PDFTOPPM:
            page_images, ocr_chunks = self._extract_pdf_pages_as_images(
                content, filename, total_pages
            )
            images.extend(page_images)
            text_chunks.extend(ocr_chunks)

        structure = {
            "total_pages": total_pages,
            "outline": extracted["outline"],
        }
        return {
            "text_chunks": text_chunks,
            "tables": tables,
            "images": images,
            "document_structure": structure,
        }

    def _extract_pdf_pages_as_images(
        self, content: bytes, filename: str, total_pages: int
    ):
        """Render page screenshots (batches of PDF_PAGE_BATCH, capped at
        ``max_pdf_pages_as_images``), save to figures/ with the reference's
        ``{stem}_page_{n}_{hash8}.png`` naming flavor, and OCR every page
        unconditionally (reference parser.py:546-613)."""
        import hashlib

        stem = Path(filename).stem
        n_pages = min(total_pages, self.max_pdf_pages_as_images)
        images: List[Dict[str, Any]] = []
        ocr_chunks: List[Dict[str, Any]] = []
        for lo in range(1, n_pages + 1, PDF_PAGE_BATCH):
            hi = min(lo + PDF_PAGE_BATCH - 1, n_pages)
            for page_num, png in render_pdf_pages(content, lo, hi):
                digest = hashlib.md5(png).hexdigest()[:8]
                img_path = (
                    self.figures_dir
                    / f"{stem}_page_{page_num - 1}_{digest}.png"
                )
                img_path.write_bytes(png)
                ocr_text = ""
                if self.enable_ocr:
                    ocr_text = ocr_image_bytes(png)
                images.append(
                    {
                        "id": f"page_{page_num - 1}",
                        "path": str(img_path),
                        "base64": base64.b64encode(png).decode(),
                        "metadata": {
                            "source": filename,
                            "page": page_num,
                            "type": "page_screenshot",
                            "format": "PNG",
                            "dpi": PDF_PAGE_DPI,
                            "ocr_text": ocr_text or None,
                        },
                    }
                )
                if ocr_text:
                    ocr_chunks.extend(
                        chunk_simple(
                            ocr_text,
                            {
                                "filename": filename,
                                "doc_type": "pdf",
                                "page": page_num,
                                "total_pages": total_pages,
                                "from_ocr": True,
                            },
                            self.splitter,
                        )
                    )
        if images:
            logger.info(
                "Rendered %d page screenshots for %s (%d OCR chunks)",
                len(images), filename, len(ocr_chunks),
            )
        return images, ocr_chunks

    async def _summarize_tables_llm(
        self, tables: List[Dict[str, Any]], cap: int = MAX_TABLE_SUMMARIES
    ) -> None:
        """Optional parallel LLM table summaries through the ctor adapter
        (reference parser.py:689-711): first ``cap`` tables, semaphore 5,
        failures keep the heuristic summary from ``build_table_obj``."""
        if self.llm_adapter is None or not tables:
            return
        sem = asyncio.Semaphore(5)

        async def one(table: Dict[str, Any]) -> None:
            async with sem:
                try:
                    summary = await self.llm_adapter.summarize(
                        table["content"], content_type="table"
                    )
                    if summary and summary.strip():
                        table["summary"] = summary.strip()
                        table.setdefault("metadata", {})["llm_summary"] = True
                except Exception as e:  # noqa: BLE001 — keep heuristic
                    logger.debug("LLM table summary failed: %s", e)

        await asyncio.gather(*(one(t) for t in tables[:cap]))

    # ------------------------------------------------------------------
    # DOCX (reference parser.py:960-1119)
    # ------------------------------------------------------------------

    def _parse_docx(self, content: bytes, filename: str) -> Dict[str, Any]:
        parsed = office.parse_docx_bytes(content)
        text_chunks = chunk_structured(
            parsed["sections"], filename, self.splitter
        )
        tables = []
        for idx, rows in enumerate(parsed["tables"]):
            obj = build_table_obj(
                f"table_{len(tables)}",
                clean_table(rows),
                {"source": filename, "table_index": idx},
            )
            if obj:
                tables.append(obj)
        images = []
        stem = Path(filename).stem
        for count, (blob, ext) in enumerate(parsed["images"]):
            img_path = self.figures_dir / f"{stem}_image_{count}.{ext}"
            img_path.write_bytes(blob)
            images.append(
                {
                    "id": f"image_{count}",
                    "path": str(img_path),
                    "base64": base64.b64encode(blob).decode(),
                    "metadata": {
                        "source": filename,
                        "index": count,
                        "format": ext.upper(),
                    },
                }
            )
        return {
            "text_chunks": text_chunks,
            "tables": tables,
            "images": images,
            "document_structure": {
                "headings": parsed["headings"],
                "sections": [],
            },
        }

    # ------------------------------------------------------------------
    # PPTX (reference parser.py:771-941)
    # ------------------------------------------------------------------

    def _parse_pptx(self, content: bytes, filename: str) -> Dict[str, Any]:
        parsed = office.parse_pptx_bytes(content)
        slides = parsed["slides"]
        text_chunks: List[Dict[str, Any]] = []
        tables: List[Dict[str, Any]] = []
        images: List[Dict[str, Any]] = []
        structure = {"slides": [], "total_slides": len(slides)}
        stem = Path(filename).stem

        for slide in slides:
            num = slide["number"]
            parts: List[str] = []
            if slide["title"]:
                parts.append(f"# {slide['title']}")
            parts.extend(slide["texts"])

            for rows in slide["tables"]:
                obj = build_table_obj(
                    f"slide_{num}_table_{len(tables)}",
                    clean_table(rows),
                    {"source": filename, "slide": num},
                )
                if obj:
                    tables.append(obj)

            for blob, ext in slide["images"]:
                img_path = (
                    self.figures_dir
                    / f"{stem}_slide_{num}_img_{len(images)}.{ext}"
                )
                img_path.write_bytes(blob)
                images.append(
                    {
                        "id": f"slide_{num}_image_{len(images)}",
                        "path": str(img_path),
                        "base64": base64.b64encode(blob).decode(),
                        "metadata": {
                            "source": filename,
                            "slide": num,
                            "format": ext.upper(),
                        },
                    }
                )

            slide_content = f"## Slide {num}\n\n" + "\n\n".join(parts)
            if slide["notes"]:
                slide_content += f"\n\n**Speaker Notes:**\n{slide['notes']}"

            structure["slides"].append(
                {
                    "slide": num,
                    "title": parts[0] if parts else None,
                    "char_count": len(slide_content),
                    "has_notes": bool(slide["notes"]),
                    "image_count": len(slide["images"]),
                    "table_count": len(slide["tables"]),
                }
            )
            if slide_content.strip():
                text_chunks.extend(
                    chunk_simple(
                        slide_content,
                        {
                            "filename": filename,
                            "doc_type": "pptx",
                            "slide": num,
                            "total_slides": len(slides),
                        },
                        self.splitter,
                    )
                )
        return {
            "text_chunks": text_chunks,
            "tables": tables,
            "images": images,
            "document_structure": structure,
        }

    # ------------------------------------------------------------------
    # HTML (reference parser.py:1123-1440)
    # ------------------------------------------------------------------

    async def _parse_html(
        self, content: bytes, filename: str, base_url: Optional[str]
    ) -> Dict[str, Any]:
        from bs4 import BeautifulSoup

        try:
            text = content.decode("utf-8")
        except UnicodeDecodeError:
            text = content.decode("latin-1", errors="ignore")
        soup = BeautifulSoup(text, "html.parser")
        for junk in soup(["script", "style", "nav", "footer"]):
            junk.decompose()

        structure = {"headings": []}
        for heading in soup.find_all(["h1", "h2", "h3", "h4", "h5", "h6"]):
            structure["headings"].append(
                {"text": heading.get_text(strip=True),
                 "level": int(heading.name[1])}
            )

        full_text = soup.get_text(separator="\n\n")
        text_chunks = chunk_simple(
            full_text,
            {"filename": filename, "doc_type": "html"},
            self.splitter,
        )

        tables = []
        for idx, table in enumerate(soup.find_all("table")):
            rows = []
            for tr in table.find_all("tr"):
                cells = tr.find_all(["td", "th"])
                row = [c.get_text(strip=True) for c in cells]
                if row and any(row):
                    rows.append(row)
            obj = build_table_obj(
                f"table_{len(tables)}",
                clean_table(rows),
                {"source": filename, "table_index": idx},
            )
            if obj:
                tables.append(obj)

        images = await self._extract_html_images(soup, filename, base_url)
        return {
            "text_chunks": text_chunks,
            "tables": tables,
            "images": images,
            "document_structure": structure,
        }

    async def _extract_html_images(
        self, soup, filename: str, base_url: Optional[str]
    ) -> List[Dict[str, Any]]:
        """data: URIs decoded inline; remote URLs fetched with bounded
        concurrency (semaphore 10, 60s budget — reference parser.py:1254,
        1275-1281)."""
        stem = Path(filename).stem
        images: List[Dict[str, Any]] = []
        tags = soup.find_all("img")

        async def handle(idx: int, tag) -> Optional[Dict[str, Any]]:
            src = tag.get("src", "")
            if not src:
                return None
            if src.startswith("data:image"):
                try:
                    header, b64data = src.split(",", 1)
                    ext = header.split("/")[1].split(";")[0].replace(
                        "jpeg", "jpg"
                    )
                    blob = base64.b64decode(b64data)
                except Exception:
                    return None
            elif src.startswith(("http://", "https://")) or base_url:
                url = src
                if base_url and not src.startswith(("http://", "https://")):
                    from urllib.parse import urljoin

                    url = urljoin(base_url, src)
                blob, ext = await self._fetch_image(url)
                if blob is None:
                    return None
            else:
                return None
            if len(blob) < 1024:  # skip tracking pixels / tiny icons
                return None
            img_path = self.figures_dir / f"{stem}_html_{idx}.{ext}"
            img_path.write_bytes(blob)
            return {
                "id": f"html_image_{idx}",
                "path": str(img_path),
                "base64": base64.b64encode(blob).decode(),
                "metadata": {
                    "source": filename,
                    "index": idx,
                    "format": ext.upper(),
                    "alt": tag.get("alt", ""),
                },
            }

        sem = asyncio.Semaphore(10)

        async def bounded(idx, tag):
            async with sem:
                return await handle(idx, tag)

        try:
            results = await asyncio.wait_for(
                asyncio.gather(
                    *(bounded(i, t) for i, t in enumerate(tags)),
                    return_exceptions=True,
                ),
                timeout=60,
            )
        except asyncio.TimeoutError:
            logger.warning("HTML image extraction timed out")
            return images
        for res in results:
            if isinstance(res, dict):
                images.append(res)
        return images

    @staticmethod
    async def _fetch_image(url: str):
        try:
            import aiohttp

            timeout = aiohttp.ClientTimeout(total=30)
            connector = aiohttp.TCPConnector(limit=20, limit_per_host=5)
            async with aiohttp.ClientSession(
                timeout=timeout, connector=connector
            ) as session:
                async with session.get(url) as resp:
                    if resp.status != 200:
                        return None, None
                    ctype = resp.headers.get("Content-Type", "")
                    if not ctype.startswith("image/"):
                        return None, None
                    ext = ctype.split("/")[1].split(";")[0].replace(
                        "jpeg", "jpg"
                    )
                    return await resp.read(), ext
        except Exception as e:  # noqa: BLE001
            logger.debug("image fetch failed for %s: %s", url, e)
            return None, None

    # ------------------------------------------------------------------
    # TXT / MD (reference parser.py:1444-1492)
    # ------------------------------------------------------------------

    def _parse_text(self, content: bytes, filename: str) -> Dict[str, Any]:
        try:
            text = content.decode("utf-8")
        except UnicodeDecodeError:
            text = content.decode("latin-1", errors="ignore")
        text_chunks = chunk_simple(
            text, {"filename": filename, "doc_type": "text"}, self.splitter
        )
        tables = []
        if filename.endswith(".md"):
            for idx, rows in enumerate(extract_markdown_tables(text)):
                obj = build_table_obj(
                    f"table_{len(tables)}",
                    clean_table(rows),
                    {"source": filename, "table_index": idx},
                )
                if obj:
                    tables.append(obj)
        return {
            "text_chunks": text_chunks,
            "tables": tables,
            "images": [],
            "document_structure": {},
        }

    # ------------------------------------------------------------------
    # Image upload (reference parser.py:1496-1560)
    # ------------------------------------------------------------------

    def _parse_image(self, content: bytes, filename: str) -> Dict[str, Any]:
        from PIL import Image

        img = Image.open(BytesIO(content))
        width, height = img.size
        fmt = (img.format or "PNG").lower().replace("jpeg", "jpg")
        stem = Path(filename).stem
        img_path = self.figures_dir / f"{stem}_upload.{fmt}"
        img_path.write_bytes(content)

        text_chunks = []
        ocr_text = ocr_image_bytes(content) if self.enable_ocr else ""
        if ocr_text:
            text_chunks = chunk_simple(
                ocr_text,
                {"filename": filename, "doc_type": "image", "from_ocr": True},
                self.splitter,
            )

        image_obj = {
            "id": "image_0",
            "path": str(img_path),
            "base64": base64.b64encode(content).decode(),
            "metadata": {
                "source": filename,
                "format": fmt.upper(),
                "size": (width, height),
                "ocr_text": ocr_text or None,
            },
        }
        return {
            "text_chunks": text_chunks,
            "tables": [],
            "images": [image_obj],
            "document_structure": {},
        }

    # ------------------------------------------------------------------
    # Housekeeping (reference parser.py:1866-1892)
    # ------------------------------------------------------------------

    def cleanup_old_figures(self, days: int = 30) -> int:
        cutoff = time.time() - days * 86400
        removed = 0
        for path in self.figures_dir.iterdir():
            if path.is_file() and path.stat().st_mtime < cutoff:
                try:
                    path.unlink()
                    removed += 1
                except OSError:
                    pass
        return removed

    async def cleanup_old_figures_async(self, days: int = 30) -> int:
        return await asyncio.to_thread(self.cleanup_old_figures, days)


def extract_markdown_tables(text: str) -> List[List[List[str]]]:
    """Markdown pipe-tables → raw row lists (reference parser.py:1463-1478)."""
    tables = []
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if (
            line.startswith("|")
            and line.endswith("|")
            and i + 1 < len(lines)
            and re.fullmatch(r"[|\s:\-]+", lines[i + 1].strip())
            and "-" in lines[i + 1]
        ):
            rows = [_split_md_row(line)]
            j = i + 2
            while j < len(lines):
                row_line = lines[j].strip()
                if row_line.startswith("|") and row_line.endswith("|"):
                    rows.append(_split_md_row(row_line))
                    j += 1
                else:
                    break
            if len(rows) >= 2:
                tables.append(rows)
            i = j
        else:
            i += 1
    return tables


def _split_md_row(line: str) -> List[str]:
    return [cell.strip() for cell in line.strip("|").split("|")]
