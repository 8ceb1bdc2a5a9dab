"""HTML → outgoing-link records (the Common-Crawl link-graph kernel).

The reference reader never builds a link graph (its VLM scan discards
markup — ``operations/scan.py:22-67``); at web scale the outlink table
is a first-class training-data artifact (URL frontier, host authority,
anchor-text mining), so the engine grows it as a beyond-reference
operator on the same tokenizer the block segmenter uses
(:mod:`vlm_ocr_doc_reader_ray.extract.html_extractor`).

Semantics (mirrored in SQL by ``corpus/sqlmirror.LINK_GRAPH_SQL``):
- one record per ``<a href=...>`` in document order, ``pos`` 0-based;
- ``anchor_text`` is the whitespace-collapsed text between the anchor
  open and its close (nested tags contribute their text);
- ``chrome`` is true when the anchor sits inside ``nav / aside /
  header / footer`` ancestry — the same chrome rule the block
  classifier uses, so link records and block records agree on what
  is boilerplate;
- ``href`` resolves against the page URL (stdlib ``urljoin``), so
  root-relative links become absolute and the graph joins on hosts;
- SPDF / corrupt / undecodable payloads yield zero links (links are
  an HTML concept here; failure is data, never an exception).
"""

from __future__ import annotations

import re
from html import unescape
from typing import List, Tuple
from urllib.parse import urljoin

from vlm_ocr_doc_reader_ray.extract.blocks import collapse_ws
from vlm_ocr_doc_reader_ray.extract.html_extractor import (
    _CHROME_TAGS,
    _RAW_CLOSE,
    _SKIP_TAGS,
    _TAG_RX,
)

_HREF_RX = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)


def _href_of(attrs: str) -> str | None:
    m = _HREF_RX.search(attrs)
    if m is None:
        return None
    return m.group(1) if m.group(1) is not None else (
        m.group(2) if m.group(2) is not None else m.group(3)
    )


def scan_links(html_text: str) -> List[Tuple[str, str, bool]]:
    """One pass of the shared tag scanner collecting anchors.

    Returns ``[(href_raw, anchor_text, chrome), ...]`` in document
    order. Anchors without an ``href`` attribute are not links and are
    skipped; nested ``<a>`` (invalid HTML) closes the open anchor
    first, matching browser recovery.
    """
    out: List[Tuple[str, str, bool]] = []
    pos = 0
    n = len(html_text)
    find = _TAG_RX.search
    skip = 0
    chrome = 0
    cur_href: str | None = None
    cur_frags: List[str] = []

    def close_anchor() -> None:
        nonlocal cur_href, cur_frags
        if cur_href is not None:
            out.append((cur_href, collapse_ws("".join(cur_frags)), chrome > 0))
        cur_href = None
        cur_frags = []

    while pos < n:
        m = find(html_text, pos)
        if m is None:
            if cur_href is not None and not skip and pos < n:
                chunk = html_text[pos:]
                cur_frags.append(unescape(chunk) if "&" in chunk else chunk)
            break
        mstart = m.start()
        if mstart > pos and cur_href is not None and not skip:
            chunk = html_text[pos:mstart]
            cur_frags.append(unescape(chunk) if "&" in chunk else chunk)
        pos = m.end()
        name = m.group("name")
        if name is None:  # comment / doctype / pi
            continue
        name = name.lower()
        if m.group("close"):
            if name == "a":
                close_anchor()
            elif name in _SKIP_TAGS:
                skip = max(0, skip - 1)
            elif name in _CHROME_TAGS:
                chrome = max(0, chrome - 1)
        else:
            if name == "a":
                close_anchor()  # lenient: nested <a> closes the prior one
                cur_href = _href_of(m.group("attrs") or "")
            elif name in _RAW_CLOSE:
                # RAWTEXT body skipped wholesale (same rule as the block
                # tokenizer): '<' inside code can't fake tags, and the
                # close tag is consumed here so no counter is needed
                mc = _RAW_CLOSE[name].search(html_text, pos)
                pos = n if mc is None else mc.end()
            elif name in _SKIP_TAGS:
                skip += 1
            elif name in _CHROME_TAGS:
                chrome += 1
    close_anchor()  # unclosed anchor at EOF still counts
    return out


def extract_links(payload: bytes, page_url: str) -> List[dict]:
    """bytes → link records (never raises; non-HTML → empty list)."""
    if not payload or payload[:6] == b"%SPDF1" or payload[:5] == b"%PDF-":
        return []
    try:
        text = payload.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        return []
    try:
        raw = scan_links(text)
    except Exception:
        return []
    return [
        {
            "url": page_url,
            "pos": i,
            "href": urljoin(page_url, href),
            "anchor_text": anchor,
            "chrome": chrome,
        }
        for i, (href, anchor, chrome) in enumerate(raw)
    ]
