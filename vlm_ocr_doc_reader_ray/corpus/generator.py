"""Synthesize Common-Crawl-style pages from the ``documents`` table.

Every generated page embeds a known main content (title + body
paragraphs + an entity-bearing contact paragraph) inside realistic
boilerplate (site header, nav, link-dense sidebar, ad unit, footer) —
for ~20% of docs the payload is instead a structured PDF-layout
container with two-column pages, running headers and page-number
footers, stored in scrambled block order so reading-order recovery is
exercised for real. ~1% of docs are deliberately corrupt payloads
(parse-failure path: failure is data).

The *golden* functions compute what a correct extractor must produce;
they are mirrored 1:1 by DuckDB SQL in ``corpus/sqlmirror.py`` for the
driver's oracle gate, and pinned against the real extractor in
``tests/test_corpus.py``.

Determinism contract: everything is a pure function of
``(doc_id, text, lang, source, rep)``; ``rep`` (replication index)
scales the corpus for benchmarks without new inputs.
"""

from __future__ import annotations

import hashlib
import html as html_mod
import json
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Dict, List

# module-level (not lazy): workers receive this module pickled
# by value, and a function-body import would re-run the import
# system on the worker, where the repo isn't on sys.path
from vlm_ocr_doc_reader_ray.extract.pdfcodec import build_pdf_pages

PARA_WORDS = 40
MIN_TAIL_WORDS = 10  # tail shorter than this merges into the previous paragraph
PDF_BLOCKS_PER_PAGE = 4
BASE_TS = datetime(2025, 1, 1, 0, 0, 0)
REP_DOC_STRIDE = 1_000_000


def is_pdf_doc(doc_id: int) -> bool:
    return doc_id % 5 == 2


def is_corrupt_doc(doc_id: int) -> bool:
    return doc_id % 97 == 13


# ---------------------------------------------------------------------------
# golden content formulas (mirrored in SQL — keep in lockstep with sqlmirror)
# ---------------------------------------------------------------------------

def paragraphs_of(text: str) -> List[str]:
    """Body paragraphs: chunks of PARA_WORDS words; a short tail
    (< MIN_TAIL_WORDS) merges into the previous chunk."""
    words = text.split(" ")
    chunks = [words[i: i + PARA_WORDS] for i in range(0, len(words), PARA_WORDS)]
    if len(chunks) > 1 and len(chunks[-1]) < MIN_TAIL_WORDS:
        chunks[-2].extend(chunks[-1])
        chunks.pop()
    return [" ".join(c) for c in chunks]


def title_of(doc_id: int, lang: str, source: str) -> str:
    return f"Document {doc_id} ({lang}/{source})"


def entity_values(doc_id: int, source: str) -> Dict[str, str]:
    return {
        "email": f"user{doc_id}@{source}.example.com",
        "phone": f"+1-555-{(doc_id * 7) % 10000:04d}",
        "date": f"2024-{1 + doc_id % 12:02d}-{1 + doc_id % 28:02d}",
        "id": f"DOC-{doc_id:08d}",
        "url": f"https://archive.example.org/item/{doc_id}",
    }


def entity_paragraph(doc_id: int, source: str) -> str:
    ev = entity_values(doc_id, source)
    return (
        f"Contact {ev['email']} or call {ev['phone']}. "
        f"Published on {ev['date']}. Reference ID {ev['id']}. "
        f"Details at {ev['url']}."
    )


@dataclass(frozen=True)
class Golden:
    """What a correct extractor must produce for one document."""

    extracted_text: str
    title: str
    paragraphs: List[str]
    entity_para: str
    n_blocks_kept: int
    page_count: int
    is_pdf: bool
    is_corrupt: bool


def golden(doc_id: int, text: str, lang: str, source: str) -> Golden:
    if is_corrupt_doc(doc_id):
        return Golden("", "", [], "", 0, 1, is_pdf_doc(doc_id), True)
    title = title_of(doc_id, lang, source)
    paras = paragraphs_of(text)
    entity = entity_paragraph(doc_id, source)
    blocks = [title] + paras + [entity]
    pdf = is_pdf_doc(doc_id)
    pages = (
        (len(blocks) + PDF_BLOCKS_PER_PAGE - 1) // PDF_BLOCKS_PER_PAGE if pdf else 1
    )
    return Golden(
        extracted_text="\n\n".join(blocks),
        title=title,
        paragraphs=paras,
        entity_para=entity,
        n_blocks_kept=len(blocks),
        page_count=pages,
        is_pdf=pdf,
        is_corrupt=False,
    )


def url_of(doc_id: int, lang: str, source: str, rep: int = 0) -> str:
    if rep == 0:
        return f"https://{source}.example.com/{lang}/{doc_id:08d}"
    return f"https://{source}.example.com/{lang}/r{rep}/{doc_id:08d}"


def warc_ts_of(doc_id: int, rep: int = 0) -> datetime:
    return BASE_TS + timedelta(seconds=doc_id) + timedelta(days=rep)


# ---------------------------------------------------------------------------
# HTML payload
# ---------------------------------------------------------------------------

def build_html(doc_id: int, text: str, lang: str, source: str) -> bytes:
    g = golden(doc_id, text, lang, source)
    esc = html_mod.escape
    nav_n = 4 + doc_id % 5
    side_n = 3 + doc_id % 4
    ev = entity_values(doc_id, source)

    nav_items = "".join(
        f'<li><a href="/section/{k}">section {k} news</a></li>' for k in range(nav_n)
    )
    side_items = "".join(
        f'<li><a href="/story/{doc_id}-{k}">related story number {k}</a></li>'
        for k in range(side_n)
    )
    paras_html = "".join(f"<p>{esc(p)}</p>" for p in g.paragraphs)
    contact_html = (
        f"<p class=\"contact\">Contact {esc(ev['email'])} or call {esc(ev['phone'])}. "
        f"Published on {ev['date']}. Reference ID {ev['id']}. "
        f"Details at <a href=\"{ev['url']}\">{ev['url']}</a>.</p>"
    )
    page = (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>{esc(g.title)}</title>"
        f"<style>body{{font-family:serif}}</style>"
        f'<script>var pageId={doc_id};</script></head><body>'
        f'<header><div class="banner">{source} daily — all the latest updates</div></header>'
        f"<nav><ul>{nav_items}</ul></nav>"
        f'<div class="layout"><aside><h3>Related</h3><ul>{side_items}</ul></aside>'
        f"<main><article><h1>{esc(g.title)}</h1>{paras_html}{contact_html}</article></main>"
        f'<div class="ad">Sponsored: buy one get one free today only</div></div>'
        f'<footer><p>© 2025 {source} media network. <a href="/terms">Terms</a> '
        f'<a href="/privacy">Privacy</a></p></footer></body></html>'
    )
    return page.encode("utf-8")


# ---------------------------------------------------------------------------
# PDF-layout payload (SPDF container, scrambled block order)
# ---------------------------------------------------------------------------

_COL_X = [(50.0, 290.0), (322.0, 562.0)]  # 32pt gutter → vertical cut
_ROW_Y = [(60.0, 360.0), (400.0, 700.0)]  # 40pt gap → horizontal cut
PAGE_W, PAGE_H = 612.0, 792.0


def _slot_bbox(slot: int) -> tuple[float, float, float, float]:
    x0, x1 = _COL_X[slot // 2]
    y0, y1 = _ROW_Y[slot % 2]
    return x0, y0, x1, y1


def layout_pages(doc_id: int, text: str, lang: str, source: str) -> List[dict]:
    """Scrambled two-column page layouts for a doc (shared by the SPDF
    container and the flat `pages` block-table source)."""
    g = golden(doc_id, text, lang, source)
    content = [(g.title, 18.0)] + [(p, 10.5) for p in g.paragraphs] + [
        (g.entity_para, 10.5)
    ]
    pages = []
    # independent of golden.page_count (which is 1 for HTML docs):
    # the layout always paginates by slot capacity; for PDF docs the
    # two values coincide
    npages = (len(content) + PDF_BLOCKS_PER_PAGE - 1) // PDF_BLOCKS_PER_PAGE
    for p in range(1, npages + 1):
        page_blocks = []
        for slot, (btext, font) in enumerate(
            content[(p - 1) * PDF_BLOCKS_PER_PAGE: p * PDF_BLOCKS_PER_PAGE]
        ):
            x0, y0, x1, y1 = _slot_bbox(slot)
            page_blocks.append(
                {"x0": x0, "y0": y0, "x1": x1, "y1": y1, "text": btext, "font_size": font}
            )
        # running header + page-number footer: margin zone, tiny font
        page_blocks.append(
            {"x0": 50.0, "y0": 20.0, "x1": 562.0, "y1": 40.0,
             "text": "CONFIDENTIAL DRAFT internal circulation only", "font_size": 8.0}
        )
        page_blocks.append(
            {"x0": 250.0, "y0": 752.0, "x1": 362.0, "y1": 772.0,
             "text": f"Page {p} of {npages}", "font_size": 8.0}
        )
        # scramble stored order: the parser must recover reading order
        page_blocks.sort(
            key=lambda b: hashlib.sha256(
                f"{b['text']}|{b['y0']}".encode("utf-8")
            ).hexdigest()
        )
        pages.append(
            {"page_num": p, "width": PAGE_W, "height": PAGE_H, "blocks": page_blocks}
        )
    return pages


def build_spdf(doc_id: int, text: str, lang: str, source: str) -> bytes:
    doc = {"pages": layout_pages(doc_id, text, lang, source)}
    return b"%SPDF1\n" + json.dumps(doc, ensure_ascii=False).encode("utf-8")


CORRUPT_PAYLOAD = b"%SPDF1\n{\"pages\": [truncated"


def build_pdf(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """Real PDF bytes for the same layout (the ``pdf_payload='pdf'``
    corpus variant — a structurally valid PDF 1.4 with Flate-compressed
    content streams, see ``extract/pdfcodec.py``)."""
    return build_pdf_pages(layout_pages(doc_id, text, lang, source))


# header + a truncated first object: real-PDF analogue of
# CORRUPT_PAYLOAD (no page tree reachable → parse_status 'failed')
CORRUPT_PDF_PAYLOAD = (
    b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R"
)


# ---------------------------------------------------------------------------
# batch synthesis (the map_batches kernel)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CorpusSpec:
    reps: int = 1  # deterministic replication factor for benchmarks
    # binary-layout payload container for PDF-slot docs: "spdf" (the
    # JSON container) or "pdf" (real PDF bytes via extract/pdfcodec).
    # Both carry the SAME page/block layout, so golden extraction
    # output — and therefore every SQL oracle — is identical.
    pdf_payload: str = "spdf"


def _rotate(text: str, rep: int) -> str:
    if rep == 0:
        return text
    words = text.split(" ")
    k = rep % len(words)
    return " ".join(words[k:] + words[:k])


def synth_batch(batch: dict, spec: CorpusSpec = CorpusSpec()) -> dict:
    """numpy/dict batch of documents rows → corpus columns.

    Input columns: doc_id, text, lang, source. Output columns follow
    the engine input contract (url, warc_ts, html, text, lang).
    """
    urls: List[str] = []
    tss: List[datetime] = []
    payloads: List[bytes] = []
    texts: List[str] = []
    langs: List[str] = []
    for doc_id, text, lang, source in zip(
        batch["doc_id"], batch["text"], batch["lang"], batch["source"]
    ):
        doc_id = int(doc_id)
        for rep in range(spec.reps):
            eff_id = doc_id + rep * REP_DOC_STRIDE
            eff_text = _rotate(text, rep)
            urls.append(url_of(doc_id, lang, source, rep))
            tss.append(warc_ts_of(doc_id, rep))
            real_pdf = spec.pdf_payload == "pdf"
            if is_corrupt_doc(eff_id):
                payloads.append(
                    CORRUPT_PDF_PAYLOAD if real_pdf else CORRUPT_PAYLOAD
                )
            elif is_pdf_doc(eff_id):
                payloads.append(
                    build_pdf(eff_id, eff_text, lang, source)
                    if real_pdf
                    else build_spdf(eff_id, eff_text, lang, source)
                )
            else:
                payloads.append(build_html(eff_id, eff_text, lang, source))
            texts.append(eff_text)
            langs.append(lang)
    return {"url": urls, "warc_ts": tss, "html": payloads, "text": texts, "lang": langs}
