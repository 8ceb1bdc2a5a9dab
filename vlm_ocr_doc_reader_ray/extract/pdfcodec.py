"""Minimal real-PDF text codec: true PDF bytes in, layout blocks out.

The reference ingests actual PDF files (rendered via pymupdf,
``preprocessing/renderer.py:35-96``). This module closes the
"first thing a real user feeds the engine" gap the same way
``pngcodec.py`` did for images: a dependency-free, deterministic
subset codec, with the Ray-side plumbing (dispatch, schema, failure
-is-data) fully real.

Writer (:func:`build_pdf_pages`): serializes the corpus generator's
page/block layout dicts as a structurally valid PDF 1.4 — catalog →
page tree → per-page Flate-compressed content streams using the
standard text operators (``BT``/``Tf``/``TL``/``Td``/``T*``/``Tj``/
``ET``), one ``BT…ET`` group per source block, text wrapped to the
block width with a Helvetica-ish 0.5·em average advance, and a
correct xref table + trailer. Blocks are written in the generator's
SCRAMBLED order — recovering reading order is the parser's job, the
same contract the SPDF container pins.

Parser (:func:`parse_pdf`): tolerant object scan (every ``N G obj …
endobj`` span; malformed xref tables can't brick it), trailer →
``/Root`` → ``/Pages`` tree walk (``/Kids`` recursion, inherited
``/MediaBox``), per-page ``/Contents`` streams inflated via zlib
(``/FlateDecode`` or raw), then a text-operator interpreter that
tracks the line matrix (``Td``/``TD``/``Tm``/``T*``/``TL``) and
collects one positioned line per show op (``Tj``/``TJ``/``'``/``"``).
Lines are clustered geometrically into blocks — same x within 2 pt
and baseline advance ≤ 1.8 em — mirroring how real extractors
(pymupdf blocks) group glyph runs, and the result feeds the proven
XY-cut / margin / heading pipeline in ``pdf_extractor.py``.

Documented simplifications (this is a subset codec, not a PDF
library): text bytes are UTF-8 inside literal/hex strings (no font
CMaps), box widths are estimated from the same 0.5·em rule the
writer wraps with (so column gaps survive the round trip exactly),
and only ``/FlateDecode`` (or no filter) streams are supported —
anything else raises and surfaces as a ``parse_status='failed'`` row,
never an exception (failure is data).
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

PDF_MAGIC = b"%PDF-"

# average glyph advance as a fraction of the font size; shared by the
# writer's wrap and the parser's width estimate so a wrapped line
# never reads back wider than its source block
_EM_ADVANCE = 0.5
_LEADING = 1.2  # TL = 1.2 em, the conventional single-space leading


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _esc_literal(s: str) -> Optional[bytes]:
    """Literal-string encoding for printable-ASCII text, else None."""
    try:
        raw = s.encode("ascii")
    except UnicodeEncodeError:
        return None
    if any(b < 0x20 or b > 0x7E for b in raw):
        return None
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _pdf_string(s: str) -> bytes:
    lit = _esc_literal(s)
    if lit is not None:
        return b"(" + lit + b")"
    return b"<" + s.encode("utf-8").hex().encode("ascii") + b">"


def _fmt(x: float) -> bytes:
    """Deterministic short number format (no trailing zeros)."""
    if x == int(x):
        return str(int(x)).encode()
    return (f"{x:.2f}").rstrip("0").rstrip(".").encode()


def wrap_text(text: str, width_pt: float, font_size: float) -> List[str]:
    """Greedy word wrap by the 0.5-em advance estimate; a word longer
    than the line gets its own line (never split mid-word, so joining
    the lines back with single spaces reproduces the input exactly)."""
    max_chars = max(1, int(width_pt / (_EM_ADVANCE * font_size)))
    lines: List[str] = []
    cur: List[str] = []
    cur_len = 0
    for w in text.split(" "):
        add = len(w) if not cur else cur_len + 1 + len(w)
        if cur and add > max_chars:
            lines.append(" ".join(cur))
            cur, cur_len = [w], len(w)
        else:
            cur, cur_len = cur + [w], add
    if cur:
        lines.append(" ".join(cur))
    return lines


def build_pdf_pages(pages: List[dict], compress: bool = True) -> bytes:
    """Layout page dicts (``page_num``/``width``/``height``/``blocks``
    with ``x0 y0 x1 y1 text font_size``, top-down y) → real PDF bytes.
    """
    objs: List[bytes] = []  # 1-based object bodies, index i → obj i+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    page_nums: List[int] = []
    pages_num_placeholder = len(objs) + 2 * len(pages) + 1

    for page in sorted(pages, key=lambda p: int(p["page_num"])):
        w = float(page.get("width", 612.0))
        h = float(page.get("height", 792.0))
        chunks: List[bytes] = []
        for b in page["blocks"]:
            size = float(b.get("font_size", 10.0))
            x0, y0 = float(b["x0"]), float(b["y0"])
            lines = wrap_text(str(b["text"]), float(b["x1"]) - x0, size)
            ops = [
                b"BT /F1 " + _fmt(size) + b" Tf " + _fmt(_LEADING * size)
                + b" TL " + _fmt(x0) + b" " + _fmt(h - y0 - size) + b" Td"
            ]
            for i, line in enumerate(lines):
                if i:
                    ops.append(b"T*")
                ops.append(_pdf_string(line) + b" Tj")
            ops.append(b"ET")
            chunks.append(b"\n".join(ops))
        data = b"\n".join(chunks)
        if compress:
            body = zlib.compress(data, 9)
            stream_dict = (
                b"<< /Length " + str(len(body)).encode()
                + b" /Filter /FlateDecode >>"
            )
        else:
            body = data
            stream_dict = b"<< /Length " + str(len(body)).encode() + b" >>"
        content_num = add(stream_dict + b"\nstream\n" + body + b"\nendstream")
        page_nums.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_num_placeholder).encode()
                + b" 0 R /MediaBox [0 0 " + _fmt(w) + b" " + _fmt(h)
                + b"] /Contents " + str(content_num).encode()
                + b" 0 R /Resources << /Font << /F1 "
                + str(font_num).encode() + b" 0 R >> >> >>"
            )
        )

    pages_num = add(
        b"<< /Type /Pages /Count " + str(len(page_nums)).encode()
        + b" /Kids [" + b" ".join(f"{n} 0 R".encode() for n in page_nums)
        + b"] >>"
    )
    assert pages_num == pages_num_placeholder
    catalog_num = add(
        b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(catalog_num).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# object parser
# ---------------------------------------------------------------------------

class _Ref(tuple):
    """(num, gen) indirect reference marker."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and buf[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_value(self) -> Any:
        self._skip_ws()
        buf = self.buf
        c = buf[self.pos: self.pos + 1]
        if c == b"<":
            if buf[self.pos + 1: self.pos + 2] == b"<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == b"(":
            return self._parse_literal_string()
        if c == b"[":
            return self._parse_array()
        if c == b"/":
            return self._parse_name()
        m = re.match(
            rb"(\d+)\s+(\d+)\s+R\b", buf[self.pos: self.pos + 24]
        )
        if m:
            self.pos += m.end()
            return _Ref((int(m.group(1)), int(m.group(2))))
        m = re.match(rb"[-+]?(?:\d+\.?\d*|\.\d+)", buf[self.pos: self.pos + 32])
        if m:
            self.pos += m.end()
            t = m.group(0)
            return float(t) if b"." in t else int(t)
        for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
            if buf[self.pos: self.pos + len(kw)] == kw:
                self.pos += len(kw)
                return val
        raise ValueError(f"bad PDF token at {self.pos}")

    def _parse_name(self) -> str:
        self.pos += 1
        start = self.pos
        buf, n = self.buf, len(self.buf)
        while self.pos < n and buf[self.pos] not in _WS and buf[self.pos] not in _DELIM:
            self.pos += 1
        raw = buf[start: self.pos]
        # #xx hex escapes in names
        return re.sub(
            rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
        ).decode("latin-1")

    def _parse_dict(self) -> Dict[str, Any]:
        self.pos += 2
        out: Dict[str, Any] = {}
        while True:
            self._skip_ws()
            if self.buf[self.pos: self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_value()

    def _parse_array(self) -> List[Any]:
        self.pos += 1
        out: List[Any] = []
        while True:
            self._skip_ws()
            if self.buf[self.pos: self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_hex_string(self) -> bytes:
        end = self.buf.index(b">", self.pos)
        hx = re.sub(rb"\s", b"", self.buf[self.pos + 1: end])
        if len(hx) % 2:
            hx += b"0"
        self.pos = end + 1
        return bytes.fromhex(hx.decode("ascii"))

    def _parse_literal_string(self) -> bytes:
        buf = self.buf
        i = self.pos + 1
        depth = 1
        out = bytearray()
        esc = {
            0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
            0x66: b"\f", 0x28: b"(", 0x29: b")", 0x5C: b"\\",
        }
        while depth:
            c = buf[i]
            if c == 0x5C:  # backslash
                nxt = buf[i + 1]
                if nxt in esc:
                    out += esc[nxt]
                    i += 2
                elif 0x30 <= nxt <= 0x37:  # octal \ddd
                    j = i + 1
                    oct_digits = b""
                    while j < i + 4 and 0x30 <= buf[j] <= 0x37:
                        oct_digits += buf[j: j + 1]
                        j += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                    i = j
                elif nxt in (0x0A, 0x0D):  # line continuation
                    i += 2
                    if nxt == 0x0D and buf[i: i + 1] == b"\n":
                        i += 1
                else:
                    out.append(nxt)
                    i += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth:
                    out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")


def _scan_objects(buf: bytes) -> Dict[int, Tuple[Any, Optional[bytes]]]:
    """Every ``N G obj … endobj`` span → {num: (value, raw_stream)}.
    Tolerant by design: works even when the xref table is stale or
    damaged (the common real-world failure), like most readers."""
    objs: Dict[int, Tuple[Any, Optional[bytes]]] = {}
    for m in _OBJ_RE.finditer(buf):
        num = int(m.group(1))
        lex = _Lexer(buf, m.end())
        try:
            val = lex.parse_value()
        except Exception:
            continue
        stream: Optional[bytes] = None
        probe = lex.pos
        while probe < len(buf) and buf[probe] in _WS:
            probe += 1
        sm = _STREAM_RE.match(buf, probe)
        if sm is not None and isinstance(val, dict):
            start = sm.end()
            length = val.get("Length")
            exact = False
            if isinstance(length, int):
                end = start + length
                exact = buf[end: end + 20].lstrip(bytes(_WS))[:9] == b"endstream"
                if not exact:
                    end = buf.index(b"endstream", start)
            else:  # /Length as a ref (or missing): scan
                end = buf.index(b"endstream", start)
            stream = buf[start:end]
            if not exact:
                # spec: ONE EOL precedes "endstream"; binary stream
                # data may itself end in 0x0A/0x0D, so never rstrip
                # more than a single EOL sequence (a bare .rstrip
                # truncated Flate streams whose last byte was \n)
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith((b"\n", b"\r")):
                    stream = stream[:-1]
        objs[num] = (val, stream)
    return objs


def _decode_stream(obj: Tuple[Any, Optional[bytes]]) -> bytes:
    val, raw = obj
    if raw is None:
        raise ValueError("not a stream object")
    filt = val.get("Filter")
    if filt is None:
        return raw
    filts = filt if isinstance(filt, list) else [filt]
    data = raw
    for f in filts:
        if f == "FlateDecode":
            data = zlib.decompress(data)
        else:
            raise ValueError(f"unsupported stream filter {f!r}")
    return data


def _resolve(objs: Dict[int, Tuple[Any, Optional[bytes]]], v: Any) -> Any:
    seen = 0
    while isinstance(v, _Ref):
        v = objs[v[0]][0]
        seen += 1
        if seen > 32:
            raise ValueError("reference cycle")
    return v


def _find_root(buf: bytes, objs: Dict[int, Tuple[Any, Optional[bytes]]]) -> dict:
    for m in re.finditer(rb"trailer", buf):
        try:
            t = _Lexer(buf, m.end()).parse_value()
            if isinstance(t, dict) and "Root" in t:
                root = _resolve(objs, t["Root"])
                if isinstance(root, dict):
                    return root
        except Exception:
            continue
    for val, _ in objs.values():  # fallback: first catalog object
        if isinstance(val, dict) and val.get("Type") == "Catalog":
            return val
    raise ValueError("no document catalog")


def _walk_pages(objs, node: dict, inherited_box, out: List[dict]) -> None:
    box = _resolve(objs, node.get("MediaBox", inherited_box))
    t = node.get("Type")
    if t == "Pages" or "Kids" in node:
        for kid in _resolve(objs, node.get("Kids", [])):
            kid_node = _resolve(objs, kid)
            if isinstance(kid_node, dict):
                _walk_pages(objs, kid_node, box, out)
    elif t == "Page":
        out.append({"node": node, "box": box})


# ---------------------------------------------------------------------------
# content-stream text interpreter
# ---------------------------------------------------------------------------

def _decode_text(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _content_lines(data: bytes) -> List[Tuple[float, float, float, str]]:
    """Interpret text operators → [(x, y_baseline_pdf, size, text)]."""
    lex = _Lexer(data)
    n = len(data)
    stack: List[Any] = []
    size = 10.0
    leading = 12.0
    lx = ly = 0.0  # line-matrix origin
    lines: List[Tuple[float, float, float, str]] = []

    def show(raw: Any) -> None:
        if isinstance(raw, bytes) and raw:
            lines.append((lx, ly, size, _decode_text(raw)))

    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if c in b"([</" or c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:
            try:
                stack.append(lex.parse_value())
            except Exception:
                lex.pos += 1
            continue
        start = lex.pos
        while lex.pos < n and data[lex.pos] not in _WS and data[lex.pos] not in _DELIM:
            lex.pos += 1
        op = data[start: lex.pos]
        if not op:
            lex.pos += 1
            continue
        if op == b"Tf" and len(stack) >= 1:
            size = float(stack[-1])
        elif op == b"TL" and stack:
            leading = float(stack[-1])
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            lx += float(stack[-2])
            ly += float(stack[-1])
            if op == b"TD":
                leading = -float(stack[-1])
        elif op == b"Tm" and len(stack) >= 6:
            lx, ly = float(stack[-2]), float(stack[-1])
        elif op == b"T*":
            ly -= leading
        elif op == b"BT":
            lx = ly = 0.0
        elif op == b"Tj" and stack:
            show(stack[-1])
        elif op == b"'" and stack:
            ly -= leading
            show(stack[-1])
        elif op == b'"' and stack:
            ly -= leading
            show(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            parts = [p for p in stack[-1] if isinstance(p, bytes)]
            show(b"".join(parts))
        stack.clear()
    return lines


def _cluster_blocks(
    lines: List[Tuple[float, float, float, str]], page_h: float
) -> List[dict]:
    """Positioned lines → block dicts (x0/y0/x1/y1/text/font_size,
    top-down y). Same-x runs with ≤ 1.8-em baseline advance merge."""
    items = []
    for x, y_pdf, size, text in lines:
        top = page_h - y_pdf - size  # writer: baseline = h - y0 - size
        items.append((round(x, 2), round(top, 2), size, text))
    items.sort(key=lambda t: (t[0], t[1], t[3]))
    blocks: List[dict] = []
    cur: Optional[dict] = None
    last_top = 0.0
    for x, top, size, text in items:
        est_w = _EM_ADVANCE * size * len(text)
        if (
            cur is not None
            and abs(x - cur["x0"]) <= 2.0
            and cur["font_size"] == size
            and 0 < (top - last_top) <= 1.8 * size
        ):
            cur["text"] += " " + text
            cur["y1"] = top + size
            cur["x1"] = max(cur["x1"], x + est_w)
        else:
            cur = {
                "x0": x, "y0": top, "x1": x + est_w, "y1": top + size,
                "text": text, "font_size": size,
            }
            blocks.append(cur)
        last_top = top
    return blocks


def parse_pdf(payload: bytes) -> List[dict]:
    """Real PDF bytes → layout page dicts (the ``extract_layout``
    input shape). Raises ``ValueError`` on anything unparseable — the
    dispatch layer converts that to a ``parse_status='failed'`` row."""
    if payload[: len(PDF_MAGIC)] != PDF_MAGIC:
        raise ValueError("not a PDF")
    objs = _scan_objects(payload)
    if not objs:
        raise ValueError("no objects")
    root = _find_root(payload, objs)
    tree = _resolve(objs, root.get("Pages"))
    if not isinstance(tree, dict):
        raise ValueError("no page tree")
    found: List[dict] = []
    _walk_pages(objs, tree, [0, 0, 612, 792], found)
    if not found:
        raise ValueError("no pages")
    pages: List[dict] = []
    for i, f in enumerate(found, start=1):
        node, box = f["node"], [float(v) for v in f["box"]]
        w, h = box[2] - box[0], box[3] - box[1]
        contents = node.get("Contents")
        refs: List[_Ref]
        if isinstance(contents, _Ref):
            resolved = _resolve(objs, contents)
            refs = (
                [r for r in resolved if isinstance(r, _Ref)]
                if isinstance(resolved, list)
                else [contents]
            )
        elif isinstance(contents, list):
            refs = [r for r in contents if isinstance(r, _Ref)]
        else:
            refs = []
        data = b"\n".join(_decode_stream(objs[r[0]]) for r in refs)
        pages.append(
            {
                "page_num": i,
                "width": w,
                "height": h,
                "blocks": _cluster_blocks(_content_lines(data), h),
            }
        )
    return pages
