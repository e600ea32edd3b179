"""Text chunking with reference-compatible semantics.

The reference splits text with LangChain's ``RecursiveCharacterTextSplitter``
configured as ``chunk_size=1000, chunk_overlap=200,
separators=["\\n\\n\\n", "\\n\\n", "\\n", ". ", " ", ""]`` (reference
``app/utils/parser.py:162-169``), with a sentence-boundary sliding-window
fallback (``parser.py:1702-1736``). Chunk *boundaries are a data contract*
(BASELINE.md §3: "chunk/overlap semantics bit-compatible"), so this module
reimplements the recursive-split algorithm exactly — split by the first
separator present, recurse into over-long pieces with the remaining
separators, then greedily merge adjacent pieces up to ``chunk_size`` keeping a
sliding ``chunk_overlap`` tail — without depending on LangChain.

Also provides the three chunk-object builders used by the parser
(cross-page, structured/heading-aware, simple; reference
``parser.py:1564-1700``) and id/doc-id helpers (``parser.py:1740-1766``).
"""

from __future__ import annotations

import hashlib
import re
import uuid
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

DEFAULT_SEPARATORS = ("\n\n\n", "\n\n", "\n", ". ", " ", "")


def _split_keeping_separator(text: str, separator: str) -> List[str]:
    """Split ``text`` by ``separator``, attaching each separator to the piece
    that follows it (LangChain ``keep_separator=True`` semantics)."""
    if separator == "":
        return [c for c in text]
    parts = re.split(f"({re.escape(separator)})", text)
    # parts alternates [lead, sep, piece, sep, piece, ...]
    merged = [parts[i] + parts[i + 1] for i in range(1, len(parts) - 1, 2)]
    if len(parts) % 2 == 0:
        merged.append(parts[-1])
    merged = [parts[0]] + merged
    return [p for p in merged if p != ""]


class RecursiveTextSplitter:
    """Recursive character splitter, behaviorally equivalent to the
    reference's LangChain configuration."""

    def __init__(
        self,
        chunk_size: int = 1000,
        chunk_overlap: int = 200,
        separators: Sequence[str] = DEFAULT_SEPARATORS,
    ) -> None:
        if chunk_overlap >= chunk_size:
            raise ValueError("chunk_overlap must be less than chunk_size")
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.separators = list(separators)

    def split_text(self, text: str) -> List[str]:
        return self._split(text, self.separators)

    def _split(self, text: str, separators: List[str]) -> List[str]:
        final_chunks: List[str] = []
        separator = separators[-1]
        remaining: List[str] = []
        for i, sep in enumerate(separators):
            if sep == "":
                separator = sep
                break
            if sep in text:
                separator = sep
                remaining = separators[i + 1 :]
                break

        splits = _split_keeping_separator(text, separator)

        # Separators are kept attached to the splits, so merging joins with "".
        good: List[str] = []
        for piece in splits:
            if len(piece) < self.chunk_size:
                good.append(piece)
            else:
                if good:
                    final_chunks.extend(self._merge(good))
                    good = []
                if not remaining:
                    final_chunks.append(piece)
                else:
                    final_chunks.extend(self._split(piece, remaining))
        if good:
            final_chunks.extend(self._merge(good))
        return final_chunks

    def _merge(self, splits: List[str]) -> List[str]:
        """Greedy merge of adjacent splits up to chunk_size with a sliding
        chunk_overlap-sized tail carried into the next chunk."""
        docs: List[str] = []
        current: List[str] = []
        total = 0
        for piece in splits:
            plen = len(piece)
            if total + plen > self.chunk_size:
                if current:
                    doc = "".join(current).strip()
                    if doc:
                        docs.append(doc)
                    while total > self.chunk_overlap or (
                        total + plen > self.chunk_size and total > 0
                    ):
                        total -= len(current[0])
                        current = current[1:]
            current.append(piece)
            total += plen
        doc = "".join(current).strip()
        if doc:
            docs.append(doc)
        return docs


def basic_chunk_text(
    text: str, chunk_size: int = 1000, chunk_overlap: int = 200
) -> List[str]:
    """Fallback fixed-window chunker with sentence-boundary backoff
    (contract of reference ``parser.py:1702-1736``): break at the latest of
    ``'. '  '.\\n'  '? '  '! '  '\\n\\n'`` when it falls past the midpoint,
    then slide the window by ``end - overlap``."""
    if not text or not text.strip():
        return []
    chunks: List[str] = []
    start = 0
    length = len(text)
    while start < length:
        end = start + chunk_size
        chunk = text[start:end]
        if end < length:
            boundary = max(
                chunk.rfind(". "),
                chunk.rfind(".\n"),
                chunk.rfind("? "),
                chunk.rfind("! "),
                chunk.rfind("\n\n"),
            )
            if boundary > chunk_size // 2:
                chunk = chunk[: boundary + 1]
                end = start + boundary + 1
        chunk = chunk.strip()
        if chunk:
            chunks.append(chunk)
        start = end - chunk_overlap
    return chunks


# ---------------------------------------------------------------------------
# Chunk-object builders (parser contracts, reference parser.py:1564-1700)
# ---------------------------------------------------------------------------


def chunk_with_pages(
    page_texts: List[Dict[str, Any]],
    filename: str,
    total_pages: int,
    splitter: Optional[RecursiveTextSplitter] = None,
) -> List[Dict[str, Any]]:
    """Cross-page chunking: concatenate page texts with ``\\n\\n``, chunk the
    continuous text, then map each chunk back to the page span it covers.
    Contract of reference ``parser.py:1564-1630`` (``pages_spanned`` metadata
    only present when a chunk spans >1 page)."""
    splitter = splitter or RecursiveTextSplitter()
    continuous = ""
    markers = []
    for page in page_texts:
        start = len(continuous)
        continuous += page["text"] + "\n\n"
        markers.append({"page": page["page"], "start": start, "end": len(continuous)})

    chunks = splitter.split_text(continuous)

    out: List[Dict[str, Any]] = []
    pos = 0
    for idx, chunk_text in enumerate(chunks):
        cstart = continuous.find(chunk_text, pos)
        cend = cstart + len(chunk_text)
        spanned = [
            m["page"] for m in markers if cstart < m["end"] and cend > m["start"]
        ]
        out.append(
            {
                "chunk_id": idx,
                "content": chunk_text.strip(),
                "metadata": {
                    "page": spanned[0] if spanned else 1,
                    "pages_spanned": spanned if len(spanned) > 1 else None,
                    "total_pages": total_pages,
                    "char_count": len(chunk_text),
                    "source": filename,
                },
            }
        )
        pos = cend
    return out


def chunk_structured(
    sections: List[Dict[str, Any]],
    filename: str,
    splitter: Optional[RecursiveTextSplitter] = None,
) -> List[Dict[str, Any]]:
    """Heading-aware chunking preserving section context (contract of
    reference ``parser.py:1632-1670``)."""
    splitter = splitter or RecursiveTextSplitter()
    out: List[Dict[str, Any]] = []
    chunk_id = 0
    for section in sections:
        content = "\n\n".join(section.get("content", []))
        if not content.strip():
            continue
        for chunk_text in splitter.split_text(content):
            out.append(
                {
                    "chunk_id": chunk_id,
                    "content": chunk_text.strip(),
                    "metadata": {
                        "section": section.get("heading"),
                        "heading_level": section.get("level", 0),
                        "char_count": len(chunk_text),
                        "source": filename,
                    },
                }
            )
            chunk_id += 1
    return out


def chunk_simple(
    text: str,
    source_metadata: Dict[str, Any],
    splitter: Optional[RecursiveTextSplitter] = None,
) -> List[Dict[str, Any]]:
    """Plain chunking with attached metadata (reference ``parser.py:1672-1700``)."""
    if not text or not text.strip():
        return []
    splitter = splitter or RecursiveTextSplitter()
    return [
        {
            "chunk_id": i,
            "content": chunk.strip(),
            "metadata": {"char_count": len(chunk), **source_metadata},
        }
        for i, chunk in enumerate(splitter.split_text(text))
    ]


# ---------------------------------------------------------------------------
# Id helpers (reference parser.py:1740-1766)
# ---------------------------------------------------------------------------


def enrich_chunks_metadata(
    chunks: List[Dict[str, Any]], doc_id: str, filename: str, doc_type: str
) -> List[Dict[str, Any]]:
    """Rewrite chunk ids to ``{doc_id}_chunk_{n}_{uuid8}`` and attach
    document-level metadata (reference ``parser.py:1740-1760``)."""
    for chunk in chunks:
        unique = uuid.uuid4().hex[:8]
        chunk["chunk_id"] = f"{doc_id}_chunk_{chunk['chunk_id']}_{unique}"
        chunk["metadata"].update(
            {"doc_id": doc_id, "filename": filename, "doc_type": doc_type}
        )
    return chunks


def generate_doc_id(content: bytes, filename: str) -> str:
    """``{sanitized_stem}_{md5(content)[:12]}`` (reference ``parser.py:1762-1766``)."""
    content_hash = hashlib.md5(content).hexdigest()[:12]
    stem = re.sub(r"[^a-zA-Z0-9]", "_", Path(filename).stem)
    return f"{stem}_{content_hash}"
