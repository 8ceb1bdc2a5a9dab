"""HTML → blocks: stdlib ``html.parser`` DOM walk with anchor-char accounting.

Deterministic replacement for the reference's VLM page scan
(``core/reader.py:128-215`` + prompt ``operations/scan.py:22-67``):
the "model" is a block segmenter + the shared density classifier
(:mod:`vlm_ocr_doc_reader_ray.extract.blocks`).

Segmentation spec:
- content of ``script/style/noscript/template`` is discarded;
- every open or close of a block-level tag flushes the current block;
- text inside ``nav/aside/header/footer`` ancestry is chrome;
- characters inside ``<a>`` count toward the block's anchor chars
  (link-density numerator); each text fragment is whitespace-collapsed
  by the one shared rule (``collapse_ws``);
- heading level comes from ``h1``-``h6``.

The parser is lenient: malformed HTML never raises (stdlib HTMLParser
is non-validating); only undecodable/contractually-broken payloads
yield ``parse_status='failed'`` — failure is data, never an exception
(reference contract: ``operations/scan.py:79-123`` returns an empty
payload on parse errors).
"""

from __future__ import annotations

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


class _Segmenter(HTMLParser):
    """Streams tag events into an ordered Block list."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._frags: List[tuple[bool, str]] = []  # (in_anchor, raw_text)
        self._cur_tag = "body"
        self._cur_heading = 0
        self._skip = 0
        self._chrome = 0
        self._anchor = 0
        self._open_blocks: List[str] = []

    # -- tag events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if tag == "a":
            self._anchor += 1
            return
        if tag == "br":
            self._frags.append((self._anchor > 0, " "))
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._open_blocks.append(tag)
            if tag in _CHROME_TAGS:
                self._chrome += 1
            self._cur_tag = tag
            self._cur_heading = _HEADING.get(tag, 0)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._anchor = max(0, self._anchor - 1)
            return
        if tag in _BLOCK_TAGS:
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

    def handle_data(self, data):
        if self._skip or not data:
            return
        self._frags.append((self._anchor > 0, data))

    # -- block construction -------------------------------------------
    def _flush(self) -> None:
        if not self._frags:
            return
        raw = "".join(f for _a, f in self._frags)
        anchor_raw = "".join(f for a, f in self._frags if a)
        self._frags = []
        text = collapse_ws(raw)
        if not text:
            return
        self.blocks.append(
            Block(
                text=text,
                tag=self._cur_tag,
                page_num=1,
                heading_level=self._cur_heading,
                anchor_chars=len(collapse_ws(anchor_raw)),
                chrome=self._chrome > 0,
                index=len(self.blocks),
            )
        )

    def finish(self) -> List[Block]:
        self._flush()
        return self.blocks


def segment_html(html_text: str) -> List[Block]:
    seg = _Segmenter()
    seg.feed(html_text)
    seg.close()
    return seg.finish()


def extract_html(payload: bytes, cfg: EngineConfig = DEFAULT_CONFIG) -> ExtractResult:
    """bytes → ExtractResult (never raises; failure is data)."""
    try:
        text = payload.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        bad = ExtractResult()
        bad.parse_status = "failed"
        return bad
    try:
        blocks = segment_html(text)
    except Exception:  # malformed beyond HTMLParser's leniency
        bad = ExtractResult()
        bad.parse_status = "failed"
        return bad
    return assemble(blocks, classify_blocks(blocks, cfg))
