"""HTML → blocks: fast tag tokenizer + anchor-char accounting.

Deterministic replacement for the reference's VLM page scan
(``core/reader.py:128-215`` + prompt ``operations/scan.py:22-67``):
the "model" is a block segmenter + the shared density classifier
(:mod:`vlm_ocr_doc_reader_ray.extract.blocks`).

Segmentation spec:
- content of ``script/style/noscript/template/title/svg`` is discarded
  (script/style/textarea are RAWTEXT: their bodies are skipped to the
  matching close tag, so ``<`` inside code can't fake tags);
- every open or close of a block-level tag flushes the current block;
- text inside ``nav/aside/header/footer`` ancestry is chrome;
- characters inside ``<a>`` count toward the block's anchor chars
  (link-density numerator); each text fragment is whitespace-collapsed
  by the one shared rule (``collapse_ws``);
- heading level comes from ``h1``-``h6``.

Two tokenizer frontends drive the same event sink: a compiled-regex
scanner (production hot path, ~3× faster) and stdlib ``HTMLParser``
(reference frontend). A differential test pins them block-identical
over the whole corpus, so the fast path can't silently drift.

The parser is lenient: malformed HTML never raises; only undecodable
payloads yield ``parse_status='failed'`` — failure is data, never an
exception (reference contract: ``operations/scan.py:79-123`` returns
an empty payload on parse errors).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from typing import List

from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig
from vlm_ocr_doc_reader_ray.extract.blocks import (
    Block,
    ExtractResult,
    assemble,
    classify_blocks,
    collapse_ws,
)

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "title", "svg"})
_RAWTEXT_TAGS = ("script", "style", "textarea")
_CHROME_TAGS = frozenset({"nav", "aside", "header", "footer"})
_HEADING = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "blockquote", "body", "caption", "dd", "div",
        "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main",
        "nav", "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot",
        "th", "thead", "tr", "ul", "aside",
    }
)


class _BlockEvents:
    """Frontend-independent event sink: tag open/close/text → Blocks.

    Two frontends drive it: the fast regex tokenizer (production) and
    stdlib ``HTMLParser`` (reference frontend) — a differential test
    asserts both produce identical blocks on the whole corpus."""

    __slots__ = (
        "blocks", "_frags", "_cur_tag", "_cur_heading",
        "_skip", "_chrome", "_anchor", "_open_blocks",
    )

    def __init__(self) -> None:
        self.blocks: List[Block] = []
        self._frags: List[tuple[bool, str]] = []  # (in_anchor, raw_text)
        self._cur_tag = "body"
        self._cur_heading = 0
        self._skip = 0
        self._chrome = 0
        self._anchor = 0
        self._open_blocks: List[str] = []

    # -- tag events ---------------------------------------------------
    def start(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            if self._frags:  # guard: skip the call for text-less tags
                self._flush()
            self._open_blocks.append(tag)
            if tag in _CHROME_TAGS:
                self._chrome += 1
            self._cur_tag = tag
            self._cur_heading = _HEADING.get(tag, 0)
        elif tag == "a":
            self._anchor += 1
        elif tag == "br":
            self._frags.append((self._anchor > 0, " "))
        elif tag in _SKIP_TAGS:
            self._skip += 1

    def end(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            if self._frags:
                self._flush()
            # lenient unwind to the nearest matching open tag
            if tag in self._open_blocks:
                while self._open_blocks:
                    popped = self._open_blocks.pop()
                    if popped in _CHROME_TAGS:
                        self._chrome = max(0, self._chrome - 1)
                    if popped == tag:
                        break
            self._cur_tag = self._open_blocks[-1] if self._open_blocks else "body"
            self._cur_heading = _HEADING.get(self._cur_tag, 0)
        elif tag == "a":
            self._anchor = max(0, self._anchor - 1)
        elif tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)

    def data(self, text: str) -> None:
        if not self._skip and text:
            self._frags.append((self._anchor > 0, text))

    # -- block construction -------------------------------------------
    def _flush(self) -> None:
        if not self._frags:
            return
        frags = self._frags
        self._frags = []
        raw = "".join([f for _a, f in frags])
        text = collapse_ws(raw)
        if not text:
            return
        # anchor text is rare (most blocks have no <a> content): skip
        # the second join+collapse unless some fragment was in-anchor
        anchor_chars = 0
        if any(a for a, _f in frags):
            anchor_chars = len(collapse_ws("".join([f for a, f in frags if a])))
        self.blocks.append(
            Block(
                text=text,
                tag=self._cur_tag,
                page_num=1,
                heading_level=self._cur_heading,
                anchor_chars=anchor_chars,
                chrome=self._chrome > 0,
                index=len(self.blocks),
            )
        )

    def finish(self) -> List[Block]:
        self._flush()
        return self.blocks


# ---------------------------------------------------------------------------
# fast frontend: one compiled regex scans tags; RAWTEXT bodies skipped
# ---------------------------------------------------------------------------

_TAG_RX = re.compile(
    r"""<(?:
          !--.*?(?:-->|$)              # comment
        | !\[CDATA\[.*?(?:\]\]>|$)     # cdata
        | [!?][^>]*>?                  # doctype / processing instruction
        | (?P<close>/)?
          (?P<name>[a-zA-Z][a-zA-Z0-9:_-]*)
          (?P<attrs>(?:[^>"']|"[^"]*"|'[^']*')*?)
          /?>
       )""",
    re.S | re.X,
)
_RAW_CLOSE = {t: re.compile(rf"</{t}\s*>", re.I) for t in _RAWTEXT_TAGS}


def _tokenize_fast(html_text: str, sink: _BlockEvents) -> None:
    pos = 0
    n = len(html_text)
    find = _TAG_RX.search
    # hot loop: ~40 tags/doc × corpus — bind methods once
    data, start, end = sink.data, sink.start, sink.end
    while pos < n:
        m = find(html_text, pos)
        if m is None:
            tail = html_text[pos:]
            if tail:
                data(unescape(tail) if "&" in tail else tail)
            break
        mstart = m.start()
        if mstart > pos:
            chunk = html_text[pos:mstart]
            data(unescape(chunk) if "&" in chunk else chunk)
        pos = m.end()
        name = m.group("name")
        if name is None:  # comment / doctype / pi
            continue
        name = name.lower()
        if m.group("close"):
            end(name)
        else:
            start(name)
            if name in _RAW_CLOSE:  # skip raw body to the real close tag
                mc = _RAW_CLOSE[name].search(html_text, pos)
                if mc is None:
                    end(name)
                    break
                pos = mc.end()
                end(name)


# ---------------------------------------------------------------------------
# reference frontend: stdlib HTMLParser driving the same sink
# ---------------------------------------------------------------------------

class _StdlibFrontend(HTMLParser):
    def __init__(self, sink: _BlockEvents) -> None:
        super().__init__(convert_charrefs=True)
        self.sink = sink

    def handle_starttag(self, tag, attrs):
        self.sink.start(tag)

    def handle_endtag(self, tag):
        self.sink.end(tag)

    def handle_data(self, data):
        self.sink.data(data)


def segment_html(html_text: str, frontend: str = "fast") -> List[Block]:
    sink = _BlockEvents()
    if frontend == "fast":
        _tokenize_fast(html_text, sink)
    else:
        p = _StdlibFrontend(sink)
        p.feed(html_text)
        p.close()
    return sink.finish()


def extract_html(
    payload: bytes, cfg: EngineConfig = DEFAULT_CONFIG, frontend: str = "fast"
) -> ExtractResult:
    """bytes → ExtractResult (never raises; failure is data)."""
    try:
        text = payload.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        bad = ExtractResult()
        bad.parse_status = "failed"
        return bad
    try:
        blocks = segment_html(text, frontend)
    except Exception:  # malformed beyond the tokenizer's leniency
        bad = ExtractResult()
        bad.parse_status = "failed"
        return bad
    return assemble(blocks, classify_blocks(blocks, cfg))
