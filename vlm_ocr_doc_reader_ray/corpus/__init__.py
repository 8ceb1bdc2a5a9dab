"""Deterministic synthetic Common-Crawl-style corpus.

Derives the input table required by the engine contract —
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)`` — from the driver-provided ``documents.parquet``
tables, with zero randomness: every byte of every page is a pure
function of ``(doc_id, text, lang, source)``. That is what makes an
exact golden oracle (and a DuckDB SQL mirror of it) possible.
"""

from vlm_ocr_doc_reader_ray.corpus.generator import (
    CorpusSpec,
    build_html,
    build_spdf,
    golden,
    is_corrupt_doc,
    is_pdf_doc,
    paragraphs_of,
    synth_batch,
)

__all__ = [
    "CorpusSpec",
    "build_html",
    "build_spdf",
    "golden",
    "is_corrupt_doc",
    "is_pdf_doc",
    "paragraphs_of",
    "synth_batch",
]
