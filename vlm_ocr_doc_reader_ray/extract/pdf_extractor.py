"""PDF-layout path: page segmentation + XY-cut reading-order recovery.

The reference renders PDF pages to PNG and OCRs them
(``preprocessing/renderer.py:35-96``). PDF rasterization libraries are
not available in this environment, so binary layout payloads use a
deterministic structured container (``SPDF``): the *plumbing* —
page/block schema, margin classification, XY-cut ordering, font-based
heading detection, multi-page assembly — is real and is what the
engine would run over blocks produced by a true PDF text extractor.

Container format (magic ``%SPDF1\\n`` then UTF-8 JSON):

    {"pages": [{"page_num": 1, "width": W, "height": H,
                "blocks": [{"x0","y0","x1","y1","text","font_size"}]}]}

Block order inside the JSON is UNSPECIFIED (the corpus generator
scrambles it): reading order is recovered per page by recursive XY-cut
— prefer the widest vertical whitespace gap (>= cfg.pdf_v_gap), else
the widest horizontal gap (>= cfg.pdf_h_gap), recursing
left-before-right / top-before-bottom; leaves are ordered by the total
key (y0, x0, text) so ties cannot depend on input order.

Margin/boilerplate rule (the PDF analogue of HTML chrome): blocks with
``font_size < pdf_min_font`` or fully inside the top/bottom margin
bands are chrome (running headers, page-number footers).
"""

from __future__ import annotations

import json
from typing import List

from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig
# module-level (not lazy): a function-body import would re-run the
# import system on by-value-pickled workers, where the repo isn't on
# sys.path
from vlm_ocr_doc_reader_ray.extract.pdfcodec import parse_pdf
from vlm_ocr_doc_reader_ray.extract.blocks import (
    Block,
    ExtractResult,
    assemble,
    classify_blocks,
    collapse_ws,
)

SPDF_MAGIC = b"%SPDF1\n"


class _LayoutBlock:
    __slots__ = ("x0", "y0", "x1", "y1", "text", "font_size")

    def __init__(self, d: dict) -> None:
        self.x0 = float(d["x0"])
        self.y0 = float(d["y0"])
        self.x1 = float(d["x1"])
        self.y1 = float(d["y1"])
        self.text = collapse_ws(str(d["text"]))
        self.font_size = float(d.get("font_size", 10.0))


def _widest_gap(intervals: List[tuple[float, float]], min_gap: float) -> float | None:
    """Midpoint of the widest gap uncovered by the given intervals.

    Ties broken toward the smallest coordinate (total order — input
    order cannot matter because intervals are sorted first).
    """
    ivs = sorted(intervals)
    merged: List[list[float]] = []
    for lo, hi in ivs:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    best_mid, best_width = None, min_gap
    for (a_lo, a_hi), (b_lo, b_hi) in zip(merged, merged[1:]):
        width = b_lo - a_hi
        if width > best_width:  # strict: first (leftmost) widest wins
            best_width = width
            best_mid = (a_hi + b_lo) / 2.0
    return best_mid


def xy_cut(blocks: List[_LayoutBlock], cfg: EngineConfig = DEFAULT_CONFIG) -> List[_LayoutBlock]:
    """Recursive XY-cut; returns blocks in reading order."""
    if len(blocks) <= 1:
        return list(blocks)
    cut_x = _widest_gap([(b.x0, b.x1) for b in blocks], cfg.pdf_v_gap)
    if cut_x is not None:
        left = [b for b in blocks if b.x1 <= cut_x]
        right = [b for b in blocks if b.x1 > cut_x]
        if left and right:
            return xy_cut(left, cfg) + xy_cut(right, cfg)
    cut_y = _widest_gap([(b.y0, b.y1) for b in blocks], cfg.pdf_h_gap)
    if cut_y is not None:
        top = [b for b in blocks if b.y1 <= cut_y]
        bottom = [b for b in blocks if b.y1 > cut_y]
        if top and bottom:
            return xy_cut(top, cfg) + xy_cut(bottom, cfg)
    return sorted(blocks, key=lambda b: (b.y0, b.x0, b.text))


def _heading_level(font_size: float, cfg: EngineConfig) -> int:
    if font_size >= cfg.pdf_h1_font:
        return 1
    if font_size >= cfg.pdf_h2_font:
        return 2
    return 0


def extract_pdf(payload: bytes, cfg: EngineConfig = DEFAULT_CONFIG) -> ExtractResult:
    """SPDF payload → ExtractResult (never raises; failure is data)."""
    bad = ExtractResult()
    bad.parse_status = "failed"
    try:
        doc = json.loads(payload[len(SPDF_MAGIC):].decode("utf-8"))
        pages = doc["pages"]
    except Exception:
        return bad
    return extract_layout(pages, cfg)


def extract_pdf_bytes(payload: bytes, cfg: EngineConfig = DEFAULT_CONFIG) -> ExtractResult:
    """REAL PDF bytes → ExtractResult (never raises; failure is data).

    The pure-Python subset parser in ``pdfcodec.py`` recovers
    positioned text blocks (the analogue of the reference's pymupdf
    render step, ``preprocessing/renderer.py:35-96``); everything
    downstream — margin classification, XY-cut reading order, heading
    detection, multi-page assembly — is the same ``extract_layout``
    the SPDF container uses, so both payload forms of one document
    yield bit-identical extractions."""
    bad = ExtractResult()
    bad.parse_status = "failed"
    try:
        pages = parse_pdf(payload)
    except Exception:
        return bad
    return extract_layout(pages, cfg)


def extract_layout(pages: List[dict], cfg: EngineConfig = DEFAULT_CONFIG) -> ExtractResult:
    """Page dicts (page_num/width/height/blocks) → ExtractResult.

    Shared by the SPDF container path and the flat ``pages``
    block-table source (reference S4: pre-rendered page input,
    ``core/processor.py:183-198``)."""
    bad = ExtractResult()
    bad.parse_status = "failed"
    blocks: List[Block] = []
    try:
        for page in sorted(pages, key=lambda p: int(p["page_num"])):
            page_num = int(page["page_num"])
            height = float(page.get("height", 792.0))
            layout = [_LayoutBlock(b) for b in page["blocks"]]
            # classify margins/fonts BEFORE the cut so running headers
            # and footers can't distort column detection
            body, chrome = [], []
            top_band = cfg.pdf_top_margin
            bottom_band = cfg.pdf_bottom_margin * (height / 792.0)
            for lb in layout:
                if lb.font_size < cfg.pdf_min_font or lb.y1 <= top_band or lb.y0 >= bottom_band:
                    chrome.append(lb)
                else:
                    body.append(lb)
            ordered = xy_cut(body, cfg)
            for lb in ordered:
                if not lb.text:
                    continue
                blocks.append(
                    Block(
                        text=lb.text,
                        tag="pdf",
                        page_num=page_num,
                        heading_level=_heading_level(lb.font_size, cfg),
                        anchor_chars=0,
                        chrome=False,
                        index=len(blocks),
                    )
                )
            for lb in sorted(chrome, key=lambda b: (b.y0, b.x0, b.text)):
                if not lb.text:
                    continue
                blocks.append(
                    Block(
                        text=lb.text,
                        tag="pdf",
                        page_num=page_num,
                        heading_level=0,
                        anchor_chars=0,
                        chrome=True,
                        index=len(blocks),
                    )
                )
    except Exception:
        return bad
    return assemble(blocks, classify_blocks(blocks, cfg))
