"""Minimal from-scratch PDF extractor (stdlib + zlib only).

The reference stacked pypdf (text, ``app/utils/parser.py:342-372``),
pdfplumber (tables), PyMuPDF (embedded images, ``:427-519``) and pdf2image/
poppler (page renders). None of those exist in this environment, so this
module implements the needed subset of ISO 32000 directly:

* object scanning — every ``N G obj … endobj`` in the file is parsed with a
  small PDF-syntax reader (dicts, arrays, names, strings, numbers, refs,
  streams); object streams (``/Type /ObjStm``) are expanded too, which
  covers both classic-xref and xref-stream files without trusting the xref
  table at all (robust against the mildly corrupt PDFs real users upload);
* filters — FlateDecode (with PNG predictors), ASCIIHex, ASCII85,
  RunLength; DCT/JPX image data is passed through raw for PIL;
* page tree walk → per-page content streams + resources;
* text extraction — a content-stream interpreter for the text operators
  (BT/ET, Tf, Td/TD/TD*, Tm, Tj, TJ, ', ") with per-font decoding:
  ToUnicode CMaps (bfchar/bfrange), 2-byte CIDs for Type0 fonts, and a
  Latin-1 fallback for simple fonts; line breaks from text-matrix y-moves,
  spaces from large TJ kerns;
* embedded images — XObject /Image: DCT streams are emitted as JPEG bytes
  verbatim; Flate-decoded RGB/Gray rasters are rebuilt via PIL;
* outline — /Outlines tree titles with nesting depth.

Page *rendering* (the reference's pdf2image screenshots) needs a rasterizer
and stays gated off, exactly as the reference gates on poppler presence.
"""

from __future__ import annotations

import re
import zlib
from io import BytesIO
from typing import Any, Dict, List, Optional, Tuple

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, other):
        return (
            isinstance(other, Ref)
            and (self.num, self.gen) == (other.num, other.gen)
        )

    def __hash__(self):
        return hash((self.num, self.gen))


class Name(str):
    """A PDF name (distinct from a string literal)."""


class Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict, self.raw = d, raw


class Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = data[self.pos]
            if c in WHITESPACE:
                self.pos += 1
            elif c == 0x25:  # '%' comment
                while self.pos < n and data[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                break

    def peek(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    def read_token(self) -> bytes:
        self.skip_ws()
        start = self.pos
        data, n = self.data, len(self.data)
        while self.pos < n and data[self.pos] not in WHITESPACE and data[
            self.pos
        ] not in DELIMITERS:
            self.pos += 1
        return data[start : self.pos]

    # --- object parsing -------------------------------------------------

    def parse_object(self) -> Any:
        self.skip_ws()
        c = self.peek()
        data = self.data
        if c == -1:
            raise ValueError("EOF in object")
        if c == 0x3C:  # '<'
            if data[self.pos : self.pos + 2] == b"<<":
                return self._parse_dict_or_stream()
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.peek() == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        tok = self.read_token()
        if tok in (b"true", b"false"):
            return tok == b"true"
        if tok == b"null":
            return None
        if re.fullmatch(rb"[+-]?\d+", tok):
            # Possible indirect reference "N G R".
            save = self.pos
            self.skip_ws()
            tok2_start = self.pos
            tok2 = self.read_token()
            if re.fullmatch(rb"\d+", tok2):
                self.skip_ws()
                tok3 = self.read_token()
                if tok3 == b"R":
                    return Ref(int(tok), int(tok2))
            self.pos = save if not tok2 else tok2_start
            self.pos = save
            return int(tok)
        if re.fullmatch(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", tok):
            return float(tok)
        raise ValueError(f"Bad token {tok[:20]!r} at {self.pos}")

    def _parse_name(self) -> Name:
        self.pos += 1  # '/'
        data, n = self.data, len(self.data)
        out = bytearray()
        while self.pos < n:
            c = data[self.pos]
            if c in WHITESPACE or c in DELIMITERS:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx'
                try:
                    out.append(int(data[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return Name(out.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        self.pos += 1
        data, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = data[self.pos]
            if c == 0x5C and self.pos + 1 < n:  # backslash
                nxt = data[self.pos + 1]
                esc = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                    0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
                }
                if nxt in esc:
                    out.append(esc[nxt])
                    self.pos += 2
                elif 0x30 <= nxt <= 0x37:  # octal
                    oct_digits = data[self.pos + 1 : self.pos + 4]
                    m = re.match(rb"[0-7]{1,3}", oct_digits)
                    out.append(int(m.group(), 8) & 0xFF)
                    self.pos += 1 + len(m.group())
                elif nxt in b"\r\n":  # line continuation
                    self.pos += 2
                    if nxt == 0x0D and self.pos < n and data[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(nxt)
                    self.pos += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.find(b">", self.pos)
        hexdata = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(hexdata) % 2:
            hexdata += b"0"
        return bytes.fromhex(hexdata.decode("ascii"))

    def _parse_dict_or_stream(self) -> Any:
        self.pos += 2  # '<<'
        d: Dict[str, Any] = {}
        while True:
            self.skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            key = self.parse_object()
            value = self.parse_object()
            d[str(key)] = value
        # stream?
        save = self.pos
        self.skip_ws()
        if self.data[self.pos : self.pos + 6] == b"stream":
            self.pos += 6
            if self.data[self.pos : self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.data[self.pos : self.pos + 1] in (b"\n", b"\r"):
                self.pos += 1
            length = d.get("Length")
            if isinstance(length, int):
                raw = self.data[self.pos : self.pos + length]
                endpos = self.data.find(b"endstream", self.pos + length)
            else:  # unresolved /Length ref — fall back to scanning
                endpos = self.data.find(b"endstream", self.pos)
                raw = self.data[self.pos : endpos].rstrip(b"\r\n")
            self.pos = (
                endpos + len(b"endstream") if endpos != -1 else len(self.data)
            )
            return Stream(d, raw)
        self.pos = save
        return d


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    stride = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    while pos + 1 + stride <= len(data) or (
        pos < len(data) and pos + 1 + stride > len(data)
    ):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(up - ul), abs(left - ul), abs(
                    left + up - 2 * ul
                )
                pred = left if pa <= pb and pa <= pc else (
                    up if pb <= pc else ul
                )
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
        if pos >= len(data):
            break
    return bytes(out)


def _apply_filter(name: str, data: bytes, parms: dict) -> bytes:
    if name in ("FlateDecode", "Fl"):
        data = zlib.decompress(data)
        pred = parms.get("Predictor", 1)
        if isinstance(pred, int) and pred >= 10:
            data = _png_predictor(
                data,
                parms.get("Colors", 1),
                parms.get("BitsPerComponent", 8),
                parms.get("Columns", 1),
            )
        return data
    if name in ("ASCIIHexDecode", "AHx"):
        clean = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0])
        if len(clean) % 2:
            clean += b"0"
        return bytes.fromhex(clean.decode())
    if name in ("ASCII85Decode", "A85"):
        import base64

        body = data.split(b"~>")[0].lstrip(b"<~")
        return base64.a85decode(re.sub(rb"\s", b"", body))
    if name in ("RunLengthDecode", "RL"):
        out = bytearray()
        i = 0
        while i < len(data):
            n = data[i]
            if n == 128:
                break
            if n < 128:
                out += data[i + 1 : i + 2 + n]
                i += 2 + n
            else:
                out += data[i + 1 : i + 2] * (257 - n)
                i += 2
        return bytes(out)
    # DCTDecode / JPXDecode / CCITT: image codecs — return raw for PIL.
    return data


class PDFDocument:
    def __init__(self, content: bytes):
        self.data = content
        self.objects: Dict[int, Any] = {}
        self._scan_objects()
        self._expand_object_streams()

    # --- object table ---------------------------------------------------

    def _scan_objects(self) -> None:
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            num = int(m.group(1))
            lex = Lexer(self.data, m.end())
            try:
                self.objects[num] = lex.parse_object()
            except Exception:
                continue

    def _expand_object_streams(self) -> None:
        for obj in list(self.objects.values()):
            if isinstance(obj, Stream) and obj.dict.get("Type") == "ObjStm":
                try:
                    data = self.stream_data(obj)
                    n = self.resolve(obj.dict.get("N", 0))
                    first = self.resolve(obj.dict.get("First", 0))
                    head = data[:first].split()
                    pairs = [
                        (int(head[i]), int(head[i + 1]))
                        for i in range(0, 2 * n, 2)
                    ]
                    for num, offset in pairs:
                        if num in self.objects:
                            continue
                        lex = Lexer(data, first + offset)
                        try:
                            self.objects[num] = lex.parse_object()
                        except Exception:
                            pass
                except Exception:
                    continue

    def resolve(self, obj: Any, depth: int = 0) -> Any:
        while isinstance(obj, Ref) and depth < 32:
            obj = self.objects.get(obj.num)
            depth += 1
        return obj

    def stream_data(self, stream: Stream) -> bytes:
        raw = stream.raw
        length = self.resolve(stream.dict.get("Length"))
        if isinstance(length, int) and length <= len(raw):
            raw = raw[:length]
        filters = self.resolve(stream.dict.get("Filter")) or []
        if isinstance(filters, (Name, str)):
            filters = [filters]
        parms = self.resolve(stream.dict.get("DecodeParms")) or [{}] * len(
            filters
        )
        if isinstance(parms, dict):
            parms = [parms]
        data = raw
        for f, p in zip(filters, parms + [{}] * len(filters)):
            data = _apply_filter(str(f), data, self.resolve(p) or {})
        return data

    # --- page tree ------------------------------------------------------

    def catalog(self) -> Optional[dict]:
        for obj in self.objects.values():
            d = obj.dict if isinstance(obj, Stream) else obj
            if isinstance(d, dict) and d.get("Type") == "Catalog":
                return d
        return None

    def pages(self) -> List[dict]:
        cat = self.catalog()
        out: List[dict] = []
        seen = set()

        def walk(node_ref, inherited):
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            key = id(node)
            if key in seen:
                return
            seen.add(key)
            merged = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    merged[k] = node[k]
            if node.get("Type") == "Page":
                page = dict(node)
                for k, v in merged.items():
                    page.setdefault(k, v)
                out.append(page)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, merged)

        if cat:
            walk(cat.get("Pages"), {})
        if not out:  # damaged page tree: fall back to any /Type /Page
            for obj in self.objects.values():
                if isinstance(obj, dict) and obj.get("Type") == "Page":
                    out.append(obj)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        data = b""
        for s in streams:
            s = self.resolve(s)
            if isinstance(s, Stream):
                data += self.stream_data(s) + b"\n"
        return data

    # --- outline --------------------------------------------------------

    def outline(self) -> List[Dict[str, Any]]:
        cat = self.catalog()
        if not cat:
            return []
        out: List[Dict[str, Any]] = []

        def walk(node_ref, level):
            node = self.resolve(node_ref)
            count = 0
            while isinstance(node, dict) and count < 1000:
                title = self.resolve(node.get("Title"))
                if isinstance(title, bytes):
                    out.append(
                        {"title": _decode_pdf_text(title), "level": level}
                    )
                if node.get("First"):
                    walk(node.get("First"), level + 1)
                node = self.resolve(node.get("Next"))
                count += 1

        root = self.resolve(cat.get("Outlines"))
        if isinstance(root, dict):
            walk(root.get("First"), 0)
        return out


def _decode_pdf_text(raw: bytes) -> str:
    if raw[:2] in (b"\xfe\xff", b"\xff\xfe"):
        try:
            return raw.decode("utf-16")
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1", errors="replace")


# ---------------------------------------------------------------------------
# Fonts / text decoding
# ---------------------------------------------------------------------------


def _parse_tounicode(cmap_data: bytes) -> Dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap → code → unicode str."""
    mapping: Dict[int, str] = {}

    def hex2str(h: bytes) -> str:
        b = bytes.fromhex(h.decode())
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return ""

    for m in re.finditer(
        rb"beginbfchar(.*?)endbfchar", cmap_data, re.S
    ):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            mapping[int(src, 16)] = hex2str(dst)
    for m in re.finditer(
        rb"beginbfrange(.*?)endbfrange", cmap_data, re.S
    ):
        body = m.group(1)
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", body
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            for code in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                mapping[code] = hex2str(
                    f"{base + code - lo_i:0{max(4, len(dst))}x}".encode()
                )
        for lo, hi, arr in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
            body, re.S,
        ):
            dsts = re.findall(rb"<([0-9A-Fa-f]+)>", arr)
            lo_i = int(lo, 16)
            for off, dst in enumerate(dsts):
                mapping[lo_i + off] = hex2str(dst)
    return mapping


class FontInfo:
    def __init__(self, doc: PDFDocument, font_dict: dict):
        font_dict = doc.resolve(font_dict) or {}
        self.subtype = str(font_dict.get("Subtype", ""))
        self.two_byte = self.subtype == "Type0"
        self.cmap: Optional[Dict[int, str]] = None
        tu = doc.resolve(font_dict.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                self.cmap = _parse_tounicode(doc.stream_data(tu))
            except Exception:
                self.cmap = None

    def decode(self, raw: bytes) -> str:
        if self.two_byte:
            codes = [
                (raw[i] << 8) | raw[i + 1]
                for i in range(0, len(raw) - 1, 2)
            ]
        else:
            codes = list(raw)
        if self.cmap:
            return "".join(self.cmap.get(c, "") for c in codes)
        if self.two_byte:
            return "".join(chr(c) if 32 <= c < 0xD800 else "" for c in codes)
        return raw.decode("latin-1", errors="replace")


DEFAULT_FONT = FontInfo.__new__(FontInfo)
DEFAULT_FONT.subtype = ""
DEFAULT_FONT.two_byte = False
DEFAULT_FONT.cmap = None


# ---------------------------------------------------------------------------
# Content-stream text interpreter
# ---------------------------------------------------------------------------

_OPERATOR_RE = re.compile(
    rb"[A-Za-z'\"][A-Za-z0-9*'\"]*"
)


def extract_page_text(doc: PDFDocument, page: dict) -> str:
    content = doc.page_content(page)
    resources = doc.resolve(page.get("Resources")) or {}
    font_dicts = doc.resolve(resources.get("Font")) or {}
    fonts = {
        name: FontInfo(doc, fd) for name, fd in font_dicts.items()
    }

    lex = Lexer(content)
    stack: List[Any] = []
    cur_font = DEFAULT_FONT
    out: List[str] = []
    last_y: Optional[float] = None

    def emit(raw: bytes) -> None:
        text = cur_font.decode(raw)
        if text:
            out.append(text)

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    n = len(content)
    while lex.pos < n:
        lex.skip_ws()
        if lex.pos >= n:
            break
        c = lex.peek()
        try:
            if c in b"/<([" or c == 0x3C or (
                48 <= c <= 57 or c in (0x2B, 0x2D, 0x2E)
            ):
                stack.append(lex.parse_object())
                continue
        except Exception:
            lex.pos += 1
            stack.clear()
            continue
        m = _OPERATOR_RE.match(content, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group()
        lex.pos = m.end()

        if op == b"Tf" and len(stack) >= 2:
            fname = stack[-2]
            cur_font = fonts.get(str(fname), DEFAULT_FONT)
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            emit(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    emit(item)
                elif isinstance(item, (int, float)) and item < -180:
                    out.append(" ")
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            newline()
            emit(stack[-1])
        elif op == b'"' and stack and isinstance(stack[-1], bytes):
            newline()
            emit(stack[-1])
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            try:
                ty = float(stack[-1])
                if abs(ty) > 1e-6:
                    newline()
                elif float(stack[-2]) > 1e-6 and out and not out[-1].endswith(
                    (" ", "\n")
                ):
                    out.append(" ")
            except (TypeError, ValueError):
                pass
        elif op == b"T*":
            newline()
        elif op == b"Tm" and len(stack) >= 6:
            try:
                y = float(stack[-1])
                if last_y is not None and abs(y - last_y) > 1e-6:
                    newline()
                last_y = y
            except (TypeError, ValueError):
                pass
        elif op == b"ET":
            newline()
        elif op == b"BT":
            last_y = None
        stack.clear()

    text = "".join(out)
    # Normalize whitespace artifacts.
    text = re.sub(r"[ \t]+\n", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


# ---------------------------------------------------------------------------
# Embedded images
# ---------------------------------------------------------------------------


def extract_page_images(
    doc: PDFDocument, page: dict
) -> List[Tuple[bytes, str, Tuple[int, int]]]:
    """→ [(encoded_bytes, ext, (width, height))] for this page's /Image
    XObjects. DCT streams pass through as JPEG; Flate rasters are re-encoded
    as PNG via PIL."""
    out: List[Tuple[bytes, str, Tuple[int, int]]] = []
    resources = doc.resolve(page.get("Resources")) or {}
    xobjects = doc.resolve(resources.get("XObject")) or {}
    for xobj in xobjects.values():
        xobj = doc.resolve(xobj)
        if not isinstance(xobj, Stream):
            continue
        d = xobj.dict
        if d.get("Subtype") != "Image":
            continue
        width = doc.resolve(d.get("Width", 0))
        height = doc.resolve(d.get("Height", 0))
        filters = doc.resolve(d.get("Filter")) or []
        if isinstance(filters, (Name, str)):
            filters = [filters]
        filters = [str(f) for f in filters]
        try:
            if "DCTDecode" in filters:
                out.append((xobj.raw, "jpg", (width, height)))
            elif "JPXDecode" in filters:
                out.append((xobj.raw, "jp2", (width, height)))
            else:
                data = doc.stream_data(xobj)
                img = _raster_to_image(doc, d, data, width, height)
                if img is not None:
                    buf = BytesIO()
                    img.save(buf, format="PNG")
                    out.append((buf.getvalue(), "png", (width, height)))
        except Exception:
            continue
    return out


def _raster_to_image(doc, d, data, width, height):
    from PIL import Image

    bpc = doc.resolve(d.get("BitsPerComponent", 8))
    cs = doc.resolve(d.get("ColorSpace"))
    if isinstance(cs, list):
        cs = str(doc.resolve(cs[0]))
    cs = str(cs)
    if bpc == 8 and cs == "DeviceRGB" and len(data) >= width * height * 3:
        return Image.frombytes("RGB", (width, height), data[: width * height * 3])
    if bpc == 8 and cs == "DeviceGray" and len(data) >= width * height:
        return Image.frombytes("L", (width, height), data[: width * height])
    if bpc == 1 and len(data) >= ((width + 7) // 8) * height:
        return Image.frombytes(
            "1", (width, height), data[: ((width + 7) // 8) * height]
        )
    return None


# ---------------------------------------------------------------------------
# Top-level convenience
# ---------------------------------------------------------------------------


def extract_pdf(content: bytes) -> Dict[str, Any]:
    """→ {pages: [{page, text}], outline: [...], images:
    [(page_num, bytes, ext, (w, h))], page_count}."""
    doc = PDFDocument(content)
    pages = doc.pages()
    page_texts = []
    images = []
    for i, page in enumerate(pages):
        try:
            text = extract_page_text(doc, page)
        except Exception:
            text = ""
        page_texts.append({"page": i + 1, "text": text})
        for img_bytes, ext, size in extract_page_images(doc, page):
            images.append((i + 1, img_bytes, ext, size))
    return {
        "pages": page_texts,
        "outline": doc.outline(),
        "images": images,
        "page_count": len(pages),
    }
