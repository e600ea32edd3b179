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

import hashlib
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
        if end < 0:
            # Unterminated hex string (truncated stream): consume to EOF.
            # end=-1 would rewind the lexer to 0 and loop forever on the
            # same '<' — a single corrupt upload must not hang a thread.
            end = len(self.data)
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
        seen: set = set()  # /First cycles must not recurse forever

        def walk(node_ref, level):
            if level > 32:  # corrupt outlines can nest arbitrarily
                return
            node = self.resolve(node_ref)
            count = 0
            while isinstance(node, dict) and count < 1000:
                if id(node) in seen:
                    return
                seen.add(id(node))
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

        def handle_array(am):
            lo_i, hi_i = int(am.group(1), 16), int(am.group(2), 16)
            dsts = re.findall(rb"<([0-9A-Fa-f]+)>", am.group(3))
            for off, dst in enumerate(dsts):
                if lo_i + off > hi_i:
                    break
                mapping[lo_i + off] = hex2str(dst)
            return b""

        # Array form FIRST, excised from the body: otherwise the plain
        # three-hex regex below also matches consecutive entries INSIDE
        # the brackets and mints bogus range mappings that override real
        # bfchar entries (subset fonts use the array form routinely).
        body = re.sub(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
            handle_array, body, flags=re.S,
        )
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", body
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            for code in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                mapping[code] = hex2str(
                    f"{base + code - lo_i:0{max(4, len(dst))}x}".encode()
                )
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
        # Glyph widths in 1/1000 em (PDF 32000-1 §9.6.2.1 /Widths for
        # simple fonts, §9.7.4.3 /W + /DW for CIDFonts). Missing entries
        # fall back to the default width so layout stays plausible for
        # fonts that omit the tables (e.g. the base-14 Helvetica).
        self.default_width = 500.0
        self.widths: Dict[int, float] = {}
        try:
            if self.two_byte:
                desc = doc.resolve(font_dict.get("DescendantFonts"))
                if isinstance(desc, list) and desc:
                    cid = doc.resolve(desc[0]) or {}
                    self.default_width = float(
                        doc.resolve(cid.get("DW", 1000)) or 1000
                    )
                    self._parse_cid_w(doc, doc.resolve(cid.get("W")))
            else:
                first = doc.resolve(font_dict.get("FirstChar"))
                arr = doc.resolve(font_dict.get("Widths"))
                if isinstance(first, (int, float)) and isinstance(arr, list):
                    for off, w in enumerate(arr):
                        w = doc.resolve(w)
                        if isinstance(w, (int, float)):
                            self.widths[int(first) + off] = float(w)
        except Exception:
            pass

    def _parse_cid_w(self, doc: "PDFDocument", w_arr) -> None:
        """CIDFont /W array: ``c [w1 w2 ...]`` or ``c_first c_last w``."""
        if not isinstance(w_arr, list):
            return
        i = 0
        while i < len(w_arr):
            a = doc.resolve(w_arr[i])
            if i + 1 < len(w_arr):
                b = doc.resolve(w_arr[i + 1])
            else:
                break
            if isinstance(b, list):
                for off, w in enumerate(b):
                    w = doc.resolve(w)
                    if isinstance(w, (int, float)):
                        self.widths[int(a) + off] = float(w)
                i += 2
            elif i + 2 < len(w_arr):
                w = doc.resolve(w_arr[i + 2])
                if isinstance(w, (int, float)):
                    for c in range(int(a), min(int(b), int(a) + 65535) + 1):
                        self.widths[c] = float(w)
                i += 3
            else:
                break

    def codes(self, raw: bytes) -> List[int]:
        if self.two_byte:
            return [
                (raw[i] << 8) | raw[i + 1]
                for i in range(0, len(raw) - 1, 2)
            ]
        return list(raw)

    def width_of(self, raw: bytes) -> float:
        """Total advance of the string in 1/1000 em (no spacing params)."""
        return sum(
            self.widths.get(c, self.default_width) for c in self.codes(raw)
        )

    def decode(self, raw: bytes) -> str:
        codes = self.codes(raw)
        if self.cmap:
            return "".join(self.cmap.get(c, "") for c in codes)
        if self.two_byte:
            return "".join(chr(c) if 32 <= c < 0xD800 else "" for c in codes)
        return raw.decode("latin-1", errors="replace")


DEFAULT_FONT = FontInfo.__new__(FontInfo)
DEFAULT_FONT.subtype = ""
DEFAULT_FONT.two_byte = False
DEFAULT_FONT.cmap = None
DEFAULT_FONT.default_width = 500.0
DEFAULT_FONT.widths = {}


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
# Positioned layout interpreter (text spans + ruling lines)
# ---------------------------------------------------------------------------
#
# This is the geometry layer under PDF table detection — the capability the
# reference gets from pdfplumber (reference app/utils/parser.py:615-716).
# It runs the content stream with full graphics/text matrix tracking and
# emits (a) text spans with device-space x/y/width/size and (b) horizontal /
# vertical ruling segments from stroked or thin-filled paths, which
# ``ingest.pdftables`` turns into tables.

# Matrices are (a, b, c, d, e, f): x' = a·x + c·y + e ; y' = b·x + d·y + f.
_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1, m2):
    """Apply m1 first, then m2 (PDF: m1 × m2 row-vector convention)."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _mat_apply(m, x, y):
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


class TextSpan:
    """One shown string in device space."""

    __slots__ = ("x0", "x1", "y", "size", "text")

    def __init__(self, x0, x1, y, size, text):
        self.x0, self.x1, self.y, self.size, self.text = x0, x1, y, size, text

    def __repr__(self):
        return f"TextSpan({self.x0:.1f}-{self.x1:.1f},{self.y:.1f},{self.text!r})"


class RuleSegment:
    """Axis-aligned line segment (from stroked paths or thin filled rects)."""

    __slots__ = ("x0", "y0", "x1", "y1")

    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0 = min(x0, x1), min(y0, y1)
        self.x1, self.y1 = max(x0, x1), max(y0, y1)

    @property
    def horizontal(self) -> bool:
        return (self.y1 - self.y0) <= 2.0 and (self.x1 - self.x0) > 4.0

    @property
    def vertical(self) -> bool:
        return (self.x1 - self.x0) <= 2.0 and (self.y1 - self.y0) > 4.0


def extract_page_layout(doc: PDFDocument, page: dict) -> Dict[str, Any]:
    """→ {"spans": [TextSpan], "rules": [RuleSegment]} in device space."""
    content = doc.page_content(page)
    resources = doc.resolve(page.get("Resources")) or {}
    font_dicts = doc.resolve(resources.get("Font")) or {}
    fonts = {name: FontInfo(doc, fd) for name, fd in font_dicts.items()}

    spans: List[TextSpan] = []
    rules: List[RuleSegment] = []

    ctm = _IDENTITY
    ctm_stack: List[Tuple[float, ...]] = []
    tm = lm = _IDENTITY  # text matrix / line matrix
    font = DEFAULT_FONT
    tfs = 12.0  # font size
    tc = 0.0  # char spacing
    tw = 0.0  # word spacing
    th = 1.0  # horizontal scale
    tl = 0.0  # leading
    # Path construction state (subpath segments as user-space points).
    path: List[Tuple[float, float, float, float]] = []
    cur_pt: Optional[Tuple[float, float]] = None

    def show(raw: bytes) -> None:
        nonlocal tm
        trm = _mat_mul((tfs * th, 0, 0, tfs, 0, 0), _mat_mul(tm, ctm))
        x0, y0 = _mat_apply(trm, 0, 0)
        # Advance in unscaled text space (em/1000 units × size).
        adv = font.width_of(raw) / 1000.0 * tfs + tc * len(font.codes(raw))
        if not font.two_byte:
            adv += tw * raw.count(b" ")
        adv *= th
        x1, _ = _mat_apply(trm, adv / max(tfs * th, 1e-9), 0)
        size = abs(trm[3]) or abs(trm[1]) or tfs
        text = font.decode(raw)
        if text.strip():
            spans.append(TextSpan(x0, x1, y0, size, text))
        tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

    def td(txv: float, tyv: float) -> None:
        nonlocal tm, lm
        lm = _mat_mul((1, 0, 0, 1, txv, tyv), lm)
        tm = lm

    def flush_path(stroke: bool, fill: bool) -> None:
        # stroke/fill distinguish the S/f/B operators; both flavors paint
        # visible lines, and rule harvesting (for table detection) only
        # cares that a segment is painted at all — so they are accepted
        # for operator-dispatch completeness and intentionally unused.
        nonlocal path
        for x0, y0, x1, y1 in path:
            dx0, dy0 = _mat_apply(ctm, x0, y0)
            dx1, dy1 = _mat_apply(ctm, x1, y1)
            seg = RuleSegment(dx0, dy0, dx1, dy1)
            if seg.horizontal or seg.vertical:
                rules.append(seg)
        path = []

    lex = Lexer(content)
    stack: List[Any] = []
    n = len(content)
    while lex.pos < n:
        lex.skip_ws()
        if lex.pos >= n:
            break
        c = lex.peek()
        try:
            if c in b"/<([" or (48 <= c <= 57 or c in (0x2B, 0x2D, 0x2E)):
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
        try:
            if op == b"q":
                ctm_stack.append(ctm)
            elif op == b"Q":
                if ctm_stack:
                    ctm = ctm_stack.pop()
            elif op == b"cm" and len(stack) >= 6:
                nums = [float(v) for v in stack[-6:]]
                ctm = _mat_mul(tuple(nums), ctm)
            elif op == b"BT":
                tm = lm = _IDENTITY
            elif op == b"Tf" and len(stack) >= 2:
                font = fonts.get(str(stack[-2]), DEFAULT_FONT)
                tfs = float(stack[-1])
            elif op == b"Tm" and len(stack) >= 6:
                tm = lm = tuple(float(v) for v in stack[-6:])
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tyv = float(stack[-1])
                if op == b"TD":
                    tl = -tyv
                td(float(stack[-2]), tyv)
            elif op == b"T*":
                td(0.0, -tl)
            elif op == b"TL" and stack:
                tl = float(stack[-1])
            elif op == b"Tc" and stack:
                tc = float(stack[-1])
            elif op == b"Tw" and stack:
                tw = float(stack[-1])
            elif op == b"Tz" and stack:
                th = float(stack[-1]) / 100.0
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                show(stack[-1])
            elif op == b"'" and stack and isinstance(stack[-1], bytes):
                td(0.0, -tl)
                show(stack[-1])
            elif op == b'"' and len(stack) >= 3 and isinstance(stack[-1], bytes):
                tw, tc = float(stack[-3]), float(stack[-2])
                td(0.0, -tl)
                show(stack[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for item in stack[-1]:
                    if isinstance(item, bytes):
                        show(item)
                    elif isinstance(item, (int, float)):
                        tm = _mat_mul(
                            (1, 0, 0, 1, -item / 1000.0 * tfs * th, 0), tm
                        )
            elif op == b"m" and len(stack) >= 2:
                cur_pt = (float(stack[-2]), float(stack[-1]))
            elif op == b"l" and len(stack) >= 2 and cur_pt is not None:
                pt = (float(stack[-2]), float(stack[-1]))
                path.append((cur_pt[0], cur_pt[1], pt[0], pt[1]))
                cur_pt = pt
            elif op == b"re" and len(stack) >= 4:
                x, y, w, h = (float(v) for v in stack[-4:])
                if abs(h) <= 2.5 or abs(w) <= 2.5:  # thin rect == rule
                    path.append((x, y, x + w, y + h))
                else:  # border rectangle contributes 4 rules
                    path.append((x, y, x + w, y))
                    path.append((x, y + h, x + w, y + h))
                    path.append((x, y, x, y + h))
                    path.append((x + w, y, x + w, y + h))
            elif op in (b"S", b"s"):
                flush_path(True, False)
            elif op in (b"f", b"F", b"f*"):
                flush_path(False, True)
            elif op in (b"B", b"B*", b"b", b"b*"):
                flush_path(True, True)
            elif op == b"n":
                path = []
                cur_pt = None
        except (TypeError, ValueError, IndexError):
            pass
        stack.clear()

    return {"spans": spans, "rules": rules}


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


def extract_pdf(content: bytes, include_layout: bool = False) -> Dict[str, Any]:
    """→ {pages: [{page, text[, layout]}], outline: [...], images:
    [(page_num, bytes, ext, (w, h))], page_count}.

    With ``include_layout`` each page dict also carries the positioned
    span/rule layout used for table detection (``ingest.pdftables``)."""
    doc = PDFDocument(content)
    pages = doc.pages()
    page_texts = []
    images = []
    seen_images: set = set()
    for i, page in enumerate(pages):
        try:
            text = extract_page_text(doc, page)
        except Exception:
            text = ""
        entry: Dict[str, Any] = {"page": i + 1, "text": text}
        if include_layout:
            try:
                entry["layout"] = extract_page_layout(doc, page)
            except Exception:
                entry["layout"] = {"spans": [], "rules": []}
        page_texts.append(entry)
        for img_bytes, ext, size in extract_page_images(doc, page):
            # Inherited (shared) Resources re-surface the same XObject on
            # every page; de-duplicate by content so a 100-page doc with
            # 5 shared images yields 5 figures, not 500.
            digest = hashlib.md5(img_bytes).digest()
            if digest in seen_images:
                continue
            seen_images.add(digest)
            images.append((i + 1, img_bytes, ext, size))
    try:
        outline = doc.outline()
    except Exception:  # noqa: BLE001 — a corrupt outline must not sink
        outline = []  # a document whose page text extracted fine
    return {
        "pages": page_texts,
        "outline": outline,
        "images": images,
        "page_count": len(pages),
    }
