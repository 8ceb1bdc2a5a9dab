"""Shared block model + boilerplate classifier + document assembly.

This is the deterministic replacement for the reference's VLM "scan"
level (``core/reader.py:128-215``): instead of asking a model for the
page text and header hierarchy, we segment the document into blocks,
classify each block keep/drop by text/link-density rules
(Boilerpipe/Readability-style), and assemble the kept blocks into the
final text with exact span-offset bookkeeping.

Both the HTML path and the PDF-layout path produce ``Block`` lists;
classification and assembly are shared so the keep/drop semantics have
exactly one implementation (byte-identity requirement of the north
star).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig


@dataclass
class Block:
    """One segmented content block before classification.

    ``chrome`` marks structurally-boilerplate blocks: nav/aside/header/
    footer ancestry for HTML, margin position or sub-minimum font size
    for PDF layout.
    """

    text: str
    tag: str  # html tag, or 'pdf'
    page_num: int = 1
    heading_level: int = 0  # 0 = not a heading
    anchor_chars: int = 0
    chrome: bool = False
    index: int = 0  # document order, assigned at segmentation time

    _n_words: int = field(default=-1, repr=False, compare=False)

    @property
    def chars(self) -> int:
        return len(self.text)

    @property
    def words(self) -> int:
        # hand-rolled cache: classify touches this repeatedly, and
        # functools.cached_property carries an RLock on py3.11 which
        # breaks cloudpickle-by-value serialization to Ray workers
        if self._n_words < 0:
            self._n_words = len(self.text.split())
        return self._n_words

    @property
    def link_density(self) -> float:
        return self.anchor_chars / self.chars if self.chars else 0.0


@dataclass
class ExtractResult:
    """Extraction output for one document.

    Replaces the reference's ``DocumentData`` (``schemas/document.py:41-52``)
    plus the span bookkeeping the reference never needed (its text came
    from a model, not from in-document offsets).

    ``spans`` are (start, end, kind, source_block) into ``text``;
    ``headers`` are (level, title, page) like the reference's
    ``structure['headers']`` (``schemas/document.py:7-18``).
    """

    text: str = ""
    spans: List[Tuple[int, int, str, int]] = field(default_factory=list)
    headers: List[Tuple[int, str, int]] = field(default_factory=list)
    n_blocks_kept: int = 0
    n_blocks_dropped: int = 0
    parse_status: str = "ok"  # 'ok' | 'failed' | 'empty'
    page_count: int = 1

    def page_of_offset(self, offset: int) -> int:
        """Page containing a character offset of ``text`` (1 if unknown)."""
        for start, end, _kind, _src in self.spans:
            if start <= offset < end:
                return self._page_of_span.get((start, end), 1)
        return 1

    # populated by assemble(); maps (start, end) -> page_num
    _page_of_span: dict = field(default_factory=dict)


BLOCK_SEP = "\n\n"  # the reference's merge rule: text chunks joined "\n\n" (core/reader.py:207)


def classify_blocks(blocks: List[Block], cfg: EngineConfig = DEFAULT_CONFIG) -> List[bool]:
    """Keep/drop decision per block. Deterministic, order-independent.

    Rules (v1 spec — pinned by tests/test_html_extractor.py):
      1. chrome blocks (nav/aside/header/footer ancestry; PDF margins /
         tiny fonts) are dropped;
      2. link-dense blocks (> ``max_link_density``) are dropped;
      3. headings survive;
      4. blocks with >= ``min_content_words`` words survive;
      5. smoothing: a short block (>= ``min_smoothed_words`` words, not
         link-dense) sandwiched between two kept blocks survives —
         captures quotes / short sentences inside an article.
    """
    n = len(blocks)
    keep = [False] * n
    for i, b in enumerate(blocks):
        if b.chrome or not b.text:
            continue
        if b.link_density > cfg.max_link_density:
            continue
        if b.heading_level > 0 or b.words >= cfg.min_content_words:
            keep[i] = True

    # smoothing pass (uses only the primary decisions, so one pass is
    # deterministic and independent of scan direction)
    primary = list(keep)
    for i, b in enumerate(blocks):
        if primary[i] or b.chrome or not b.text:
            continue
        if b.link_density > cfg.max_link_density or b.words < cfg.min_smoothed_words:
            continue
        if _nearest(primary, blocks, i, -1) and _nearest(primary, blocks, i, +1):
            keep[i] = True
    return keep


def _nearest(primary: List[bool], blocks: List[Block], i: int, step: int) -> bool:
    """Was the nearest non-empty neighbour in direction ``step`` kept?"""
    j = i + step
    while 0 <= j < len(blocks):
        if blocks[j].text:
            return primary[j]
        j += step
    return False


def assemble(blocks: List[Block], keep: List[bool]) -> ExtractResult:
    """Join kept blocks (document order) into the final text with spans.

    Offsets are computed by prefix sums over the kept sequence, so the
    result is invariant to how the work was partitioned — the ordering
    key is ``block.index`` (and ``page_num``), never arrival order.
    """
    result = ExtractResult()
    kept = [b for b, k in sorted(zip(blocks, keep), key=lambda bk: (bk[0].page_num, bk[0].index)) if k]
    result.n_blocks_kept = len(kept)
    result.n_blocks_dropped = len(blocks) - len(kept)
    result.page_count = max((b.page_num for b in blocks), default=1)

    parts: List[str] = []
    offset = 0
    for b in kept:
        if parts:
            offset += len(BLOCK_SEP)
        start = offset
        end = start + len(b.text)
        parts.append(b.text)
        result.spans.append((start, end, b.tag, b.index))
        result._page_of_span[(start, end)] = b.page_num
        if b.heading_level > 0:
            result.headers.append((b.heading_level, b.text, b.page_num))
        offset = end
    result.text = BLOCK_SEP.join(parts)
    if not result.text:
        result.parse_status = "empty"
    return result


def collapse_ws(raw: str) -> str:
    """The single whitespace-normalization rule shared by every path."""
    return " ".join(raw.split())
