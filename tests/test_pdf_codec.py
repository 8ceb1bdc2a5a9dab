"""Real-PDF codec (extract/pdfcodec.py): the write→parse→XY-cut round
trip must reproduce the SPDF golden extraction bit-for-bit, and
malformed PDFs must surface as failure-is-data rows, never raises.
Pure-Python tests — no Ray session needed."""

from __future__ import annotations

import duckdb
import pytest

from vlm_ocr_doc_reader_ray.corpus.generator import (
    CORRUPT_PDF_PAYLOAD,
    build_pdf,
    build_spdf,
    golden,
    is_corrupt_doc,
    is_pdf_doc,
    layout_pages,
)
from vlm_ocr_doc_reader_ray.extract.document import extract_document
from vlm_ocr_doc_reader_ray.extract.pdf_extractor import (
    extract_pdf,
    extract_pdf_bytes,
)
from vlm_ocr_doc_reader_ray.extract.pdfcodec import (
    build_pdf_pages,
    parse_pdf,
    wrap_text,
)

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    try:
        return con.execute(
            "SELECT doc_id, text, lang, source FROM "
            f"read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    finally:
        con.close()


class TestRoundTrip:
    def test_every_pdf_doc_matches_spdf_extraction(self):
        docs = [d for d in _docs() if is_pdf_doc(d[0]) and not is_corrupt_doc(d[0])]
        assert len(docs) > 50
        multi_page = 0
        for doc_id, text, lang, source in docs:
            r_pdf = extract_pdf_bytes(build_pdf(doc_id, text, lang, source))
            r_spdf = extract_pdf(build_spdf(doc_id, text, lang, source))
            assert r_pdf.text == r_spdf.text, doc_id
            assert r_pdf.page_count == r_spdf.page_count, doc_id
            assert r_pdf.n_blocks_kept == r_spdf.n_blocks_kept, doc_id
            assert r_pdf.headers == r_spdf.headers, doc_id
            assert r_pdf.parse_status == r_spdf.parse_status == "ok"
            if r_pdf.page_count > 1:
                multi_page += 1
        assert multi_page > 0  # the sample exercises the page tree walk

    def test_matches_golden_formula(self):
        doc_id, text, lang, source = next(
            d for d in _docs() if is_pdf_doc(d[0]) and not is_corrupt_doc(d[0])
        )
        g = golden(doc_id, text, lang, source)
        r = extract_pdf_bytes(build_pdf(doc_id, text, lang, source))
        assert r.text == g.extracted_text
        assert r.page_count == g.page_count

    def test_dispatch_routes_pdf_magic(self):
        doc_id, text, lang, source = next(
            d for d in _docs() if is_pdf_doc(d[0]) and not is_corrupt_doc(d[0])
        )
        payload = build_pdf(doc_id, text, lang, source)
        assert payload[:5] == b"%PDF-"
        assert extract_document(payload).parse_status == "ok"

    def test_uncompressed_streams_parse_identically(self):
        doc_id, text, lang, source = next(
            d for d in _docs() if is_pdf_doc(d[0]) and not is_corrupt_doc(d[0])
        )
        pages = layout_pages(doc_id, text, lang, source)
        a = extract_pdf_bytes(build_pdf_pages(pages, compress=True))
        b = extract_pdf_bytes(build_pdf_pages(pages, compress=False))
        assert a.text == b.text and a.text


def _pages_with(text):
    """A realistic page (title + two body slots) carrying ``text``."""
    return [
        {
            "page_num": 1,
            "width": 612.0,
            "height": 792.0,
            "blocks": [
                {"x0": 50.0, "y0": 60.0, "x1": 290.0, "y1": 360.0,
                 "text": "A Title Line", "font_size": 18.0},
                {"x0": 50.0, "y0": 400.0, "x1": 290.0, "y1": 700.0,
                 "text": text, "font_size": 10.5},
                {"x0": 322.0, "y0": 60.0, "x1": 562.0, "y1": 360.0,
                 "text": "closing body paragraph words", "font_size": 10.5},
            ],
        }
    ]


class TestStringEncoding:
    _PAD = " the quick brown fox jumps over twelve lazy dogs again and again"

    @pytest.mark.parametrize(
        "text",
        [
            "plain ascii words only" + _PAD,
            r"parens (nested (deep)) and \backslash\ mix" + _PAD,
            "unicode: café über straße — dash" + _PAD,
            "mixed (a\\b) café" + _PAD,
        ],
    )
    def test_text_roundtrip(self, text):
        """PDF string escaping / hex fallback must be lossless: the
        real-PDF extraction equals the SPDF extraction of the same
        layout, and the payload text survives verbatim."""
        import json

        pages = _pages_with(text)
        spdf = extract_pdf(b"%SPDF1\n" + json.dumps({"pages": pages}).encode("utf-8"))
        pdf = extract_pdf_bytes(build_pdf_pages(pages))
        assert pdf.text == spdf.text
        assert text in pdf.text

    def test_stream_ending_in_eol_byte_not_truncated(self):
        """Regression: Flate data whose LAST compressed byte is 0x0A
        or 0x0D must survive — a bare .rstrip(b"\\r\\n") on the stream
        span truncated such streams (zlib error -5). Brute-force a
        payload whose compressed form ends in an EOL byte."""
        import re as _re

        stream_re = _re.compile(rb"stream\r?\n(.*?)endstream", _re.DOTALL)
        for k in range(5000):
            # vary length AND content so the zlib adler32 tail byte
            # sweeps the full 0-255 range (similar texts cluster)
            junk = "".join(chr(97 + (k * (i + 3)) % 26) for i in range(k % 23 + 1))
            text = f"padding {junk} {k * k} words" + self._PAD
            payload = build_pdf_pages(_pages_with(text), compress=True)
            # group(1) ends with the writer's framing "\n"; the byte
            # BEFORE it is the last byte of the Flate data
            if any(
                m.group(1)[-2:-1] in (b"\n", b"\r")
                for m in stream_re.finditer(payload)
            ):
                break
        else:  # pragma: no cover
            pytest.skip("no EOL-tailed compressed stream found")
        r = extract_pdf_bytes(payload)
        assert r.parse_status == "ok"
        assert text in r.text

    def test_wrap_rejoin_identity(self):
        text = "w " + "x" * 300 + " tail words here"  # overlong word
        lines = wrap_text(text, 240.0, 10.5)
        assert " ".join(lines) == text
        assert len(lines) >= 2


class TestFailureIsData:
    @pytest.mark.parametrize(
        "payload",
        [
            CORRUPT_PDF_PAYLOAD,
            b"%PDF-1.4\n",
            b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n",
            b"%PDF-garbage" + bytes(range(256)),
        ],
    )
    def test_malformed_pdf_fails_cleanly(self, payload):
        r = extract_pdf_bytes(payload)
        assert r.parse_status == "failed"
        assert r.text == ""
        assert r.page_count == 1

    def test_non_pdf_raises_in_parser_only(self):
        with pytest.raises(ValueError):
            parse_pdf(b"<html></html>")
        # ...but the dispatch layer routes it down the HTML path
        # (status 'empty': parsed fine, no keepable content)
        assert extract_document(b"<html><p>hi</p></html>").parse_status == "empty"
