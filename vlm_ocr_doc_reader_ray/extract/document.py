"""Per-document dispatch: payload magic → HTML or PDF-layout path.

The reference accepts exactly two ingest forms — a PDF path or
pre-rendered page images (``core/processor.py:47-155``). Here the
single input column ``html: binary`` carries either an HTML page or a
binary layout payload, distinguished by magic bytes, mirroring how a
Common-Crawl-style corpus mixes text/HTML records with binary
documents.
"""

from __future__ import annotations

from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig
from vlm_ocr_doc_reader_ray.extract.blocks import ExtractResult
from vlm_ocr_doc_reader_ray.extract.html_extractor import extract_html
from vlm_ocr_doc_reader_ray.extract.pdf_extractor import (
    SPDF_MAGIC,
    extract_pdf,
    extract_pdf_bytes,
)
from vlm_ocr_doc_reader_ray.extract.pdfcodec import PDF_MAGIC

__all__ = ["ExtractResult", "extract_document"]


def extract_document(payload: bytes, cfg: EngineConfig = DEFAULT_CONFIG) -> ExtractResult:
    """One document in, one ExtractResult out. Never raises."""
    if payload is None:
        bad = ExtractResult()
        bad.parse_status = "failed"
        return bad
    if payload[: len(SPDF_MAGIC)] == SPDF_MAGIC:
        return extract_pdf(payload, cfg)
    if payload[: len(PDF_MAGIC)] == PDF_MAGIC:
        return extract_pdf_bytes(payload, cfg)
    return extract_html(payload, cfg)
