"""DOCX / PPTX extraction via stdlib zipfile + ElementTree.

The reference used python-docx / python-pptx (``app/utils/parser.py:960-1119,
771-941``); those libraries are not in this environment, and OOXML documents
are just zip archives of XML — so this module reads the XML directly,
producing the same structures the reference builds:

* DOCX → heading-aware sections (style "Heading N" starts a section),
  tables (rows of cell texts), images from document relationships.
* PPTX → per-slide: title, shape texts, tables, pictures, speaker notes.

Only well-formed OOXML is handled; malformed archives/XML raise ValueError
(zipfile.BadZipFile and ElementTree.ParseError are normalized to it at the
two parse entry points) like the reference's parse failures.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO
from typing import Any, Dict, List, Optional, Tuple

NS = {
    "w": "http://schemas.openxmlformats.org/wordprocessingml/2006/main",
    "a": "http://schemas.openxmlformats.org/drawingml/2006/main",
    "p": "http://schemas.openxmlformats.org/presentationml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "rel": "http://schemas.openxmlformats.org/package/2006/relationships",
}


def _q(tag: str) -> str:
    prefix, _, local = tag.partition(":")
    return f"{{{NS[prefix]}}}{local}"


def _read_rels(zf: zipfile.ZipFile, rels_path: str) -> Dict[str, str]:
    """relationship id → target path."""
    try:
        root = ET.fromstring(zf.read(rels_path))
    except KeyError:
        return {}
    return {
        rel.get("Id"): rel.get("Target")
        for rel in root.findall(_q("rel:Relationship"))
    }


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------


def _docx_style_names(zf: zipfile.ZipFile) -> Dict[str, str]:
    """styleId → human style name (python-docx matched on names like
    'Heading 1'; the XML stores ids like 'Heading1')."""
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except KeyError:
        return {}
    out = {}
    for style in root.findall(_q("w:style")):
        sid = style.get(_q("w:styleId"))
        name_el = style.find(_q("w:name"))
        if sid and name_el is not None:
            out[sid] = name_el.get(_q("w:val"), sid)
    return out


def _para_text(para: ET.Element) -> str:
    parts = []
    for node in para.iter():
        if node.tag == _q("w:t"):
            parts.append(node.text or "")
        elif node.tag == _q("w:tab"):
            parts.append("\t")
        elif node.tag == _q("w:br"):
            parts.append("\n")
    return "".join(parts)


def _heading_level(style_name: str) -> Optional[int]:
    """'Heading 1' / 'Heading1' → 1; non-headings → None. Mirrors the
    reference's ``style.name.startswith('Heading')`` + int-parse
    (parser.py:974-990)."""
    if not style_name.startswith("Heading"):
        return None
    digits = style_name.replace("Heading", "").strip()
    try:
        return int(digits or "0")
    except ValueError:
        return 0




def _normalized_errors(fn):
    """Normalize stdlib parse failures to the documented ValueError
    contract (zipfile.BadZipFile and ET.ParseError are not ValueError
    subclasses; KeyError covers archives missing their main part)."""
    import functools

    @functools.wraps(fn)
    def wrap(content):
        try:
            return fn(content)
        except (zipfile.BadZipFile, ET.ParseError, KeyError) as e:
            raise ValueError(f"malformed OOXML document: {e}") from e
    return wrap


@_normalized_errors
def parse_docx_bytes(content: bytes) -> Dict[str, Any]:
    """→ {sections: [{heading, level, content: [para,...]}],
         headings: [{text, level}],
         tables: [rows-of-cells], images: [(bytes, ext)]}"""
    zf = zipfile.ZipFile(BytesIO(content))
    styles = _docx_style_names(zf)
    body = ET.fromstring(zf.read("word/document.xml")).find(_q("w:body"))
    if body is None:
        raise ValueError("DOCX has no document body")

    sections: List[Dict[str, Any]] = []
    headings: List[Dict[str, Any]] = []
    current = {"heading": None, "level": 0, "content": []}
    tables: List[List[List[str]]] = []

    for el in body:
        if el.tag == _q("w:p"):
            text = _para_text(el)
            if not text.strip():
                continue
            style_el = el.find(f"{_q('w:pPr')}/{_q('w:pStyle')}")
            style_id = style_el.get(_q("w:val")) if style_el is not None else ""
            style_name = styles.get(style_id, style_id or "")
            level = _heading_level(style_name)
            if level is not None:
                # Keep heading-only sections (a heading immediately
                # followed by another heading): dropping them loses the
                # heading text from every chunk/embedding downstream.
                if current["content"] or current["heading"]:
                    sections.append(dict(current))
                current = {"heading": text.strip(), "level": level, "content": []}
                headings.append({"text": text.strip(), "level": level})
            else:
                current["content"].append(text)
        elif el.tag == _q("w:tbl"):
            rows = []
            for tr in el.findall(_q("w:tr")):
                cells = []
                for tc in tr.findall(_q("w:tc")):
                    cell_paras = [
                        _para_text(p) for p in tc.iter(_q("w:p"))
                    ]
                    cells.append("\n".join(cell_paras).strip())
                rows.append(cells)
            if rows:
                tables.append(rows)
    if current["content"] or current["heading"]:
        sections.append(current)

    # Images via document relationships (reference parser.py:1074-1108).
    images: List[Tuple[bytes, str]] = []
    rels = _read_rels(zf, "word/_rels/document.xml.rels")
    for target in rels.values():
        if "media/" in target:
            path = "word/" + target.lstrip("/")
            try:
                blob = zf.read(path)
            except KeyError:
                continue
            ext = path.rsplit(".", 1)[-1].lower().replace("jpeg", "jpg")
            images.append((blob, ext))

    return {
        "sections": sections,
        "headings": headings,
        "tables": tables,
        "images": images,
    }


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------


def _slide_number(name: str) -> int:
    m = re.search(r"slide(\d+)\.xml$", name)
    return int(m.group(1)) if m else 0


def _shape_text(tx_body: ET.Element) -> str:
    paras = []
    for a_p in tx_body.findall(_q("a:p")):
        runs = [t.text or "" for t in a_p.iter(_q("a:t"))]
        paras.append("".join(runs))
    return "\n".join(paras)


def _is_title_shape(sp: ET.Element) -> bool:
    ph = sp.find(
        f"{_q('p:nvSpPr')}/{_q('p:nvPr')}/{_q('p:ph')}"
    )
    return ph is not None and ph.get("type") in ("title", "ctrTitle")


@_normalized_errors
def parse_pptx_bytes(content: bytes) -> Dict[str, Any]:
    """→ {slides: [{number, title, texts, tables, images:[(bytes, ext)],
    notes}]} in slide order."""
    zf = zipfile.ZipFile(BytesIO(content))
    slide_names = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=_slide_number,
    )
    slides = []
    for name in slide_names:
        num = _slide_number(name)
        root = ET.fromstring(zf.read(name))
        rels = _read_rels(
            zf, f"ppt/slides/_rels/slide{num}.xml.rels"
        )
        title = None
        texts: List[str] = []
        tables: List[List[List[str]]] = []
        images: List[Tuple[bytes, str]] = []

        for sp in root.iter(_q("p:sp")):
            tx = sp.find(f"{_q('p:txBody')}")
            if tx is None:
                continue
            text = _shape_text(tx).strip()
            if not text:
                continue
            if title is None and _is_title_shape(sp):
                title = text
            else:
                texts.append(text)

        for tbl in root.iter(_q("a:tbl")):
            rows = []
            for tr in tbl.findall(_q("a:tr")):
                cells = []
                for tc in tr.findall(_q("a:tc")):
                    tx = tc.find(_q("a:txBody"))
                    cells.append(
                        _shape_text(tx).strip() if tx is not None else ""
                    )
                if any(cells):
                    rows.append(cells)
            if rows:
                tables.append(rows)

        for pic in root.iter(_q("p:pic")):
            blip = pic.find(
                f"{_q('p:blipFill')}/{_q('a:blip')}"
            )
            if blip is None:
                continue
            rid = blip.get(_q("r:embed"))
            target = rels.get(rid)
            if not target:
                continue
            path = "ppt/" + target.replace("../", "")
            try:
                blob = zf.read(path)
            except KeyError:
                continue
            ext = path.rsplit(".", 1)[-1].lower().replace("jpeg", "jpg")
            images.append((blob, ext))

        notes = ""
        # Resolve the slide's notesSlide RELATIONSHIP — filename numbers
        # are not guaranteed to pair (after deletions/reorders slide3's
        # rels may point at notesSlide1.xml); fall back to the
        # number-match convention only when no relationship names one.
        notes_name = next(
            (
                "ppt/" + t.replace("../", "")
                for t in rels.values()
                if "notesSlide" in t
            ),
            f"ppt/notesSlides/notesSlide{num}.xml",
        )
        if notes_name in zf.namelist():
            notes_root = ET.fromstring(zf.read(notes_name))
            notes = "\n".join(
                t.text or "" for t in notes_root.iter(_q("a:t"))
            ).strip()

        slides.append(
            {
                "number": num,
                "title": title,
                "texts": texts,
                "tables": tables,
                "images": images,
                "notes": notes,
            }
        )
    return {"slides": slides}
