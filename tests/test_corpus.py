"""Golden roundtrip: generator → extractor reproduces the golden text
byte-for-byte for EVERY document (pure single-process, no Ray).

This is the oracle layer of the north-star invariant: the distributed
pipeline is separately checked against the same goldens in
``test_pipeline_identity.py``.
"""

import hashlib

from vlm_ocr_doc_reader_ray.corpus.generator import (
    CORRUPT_PAYLOAD,
    build_html,
    build_spdf,
    entity_values,
    golden,
    is_corrupt_doc,
    is_pdf_doc,
    paragraphs_of,
    url_of,
)
from vlm_ocr_doc_reader_ray.extract import process_document


def _payload(doc_id, text, lang, source):
    if is_corrupt_doc(doc_id):
        return CORRUPT_PAYLOAD
    if is_pdf_doc(doc_id):
        return build_spdf(doc_id, text, lang, source)
    return build_html(doc_id, text, lang, source)


def test_paragraph_chunking_rules():
    w = lambda n: " ".join(f"w{i}" for i in range(n))
    assert len(paragraphs_of(w(10))) == 1
    assert len(paragraphs_of(w(40))) == 1
    assert len(paragraphs_of(w(45))) == 1  # 5-word tail merges
    assert paragraphs_of(w(45))[0].split()[-1] == "w44"
    assert len(paragraphs_of(w(50))) == 2  # 10-word tail stands alone
    assert len(paragraphs_of(w(100))) == 3


def test_every_document_roundtrips_byte_identically(small_documents):
    assert len(small_documents) == 500
    n_pdf = n_corrupt = 0
    for doc_id, text, lang, source in small_documents:
        g = golden(doc_id, text, lang, source)
        res, entries = process_document(_payload(doc_id, text, lang, source))
        assert res.text == g.extracted_text, f"text mismatch doc {doc_id}"
        if g.is_corrupt:
            n_corrupt += 1
            assert res.parse_status == "failed"
            assert entries == []
            continue
        if g.is_pdf:
            n_pdf += 1
        assert res.parse_status == "ok"
        assert res.n_blocks_kept == g.n_blocks_kept
        assert res.page_count == g.page_count
        assert res.headers == [(1, g.title, 1)]
        # registry: exactly the five planted entities, all verified 3/3
        assert {e.kind: e.value for e in entries} == entity_values(doc_id, source)
        assert all(
            e.resolution == 2 and e.verified and e.confidence == "3/3" for e in entries
        )
        # entities live on the last page
        assert all(e.page_num == g.page_count for e in entries)
        # spans index into the text exactly
        for s, e_, _k, _b in res.spans:
            assert 0 <= s < e_ <= len(res.text)
    assert n_pdf > 50
    assert n_corrupt > 0


def test_registry_span_offsets_point_at_values(small_documents):
    doc_id, text, lang, source = small_documents[0]
    res, entries = process_document(_payload(doc_id, text, lang, source))
    for e in entries:
        assert res.text[e.span_start: e.span_end] == e.value


def test_entity_id_rule_matches_reference_shape(small_documents):
    """entity_id = scan_{page}_{sha256(prompt)[:8]} (reference operations/scan.py:159-166)."""
    doc_id, text, lang, source = small_documents[0]
    _res, entries = process_document(_payload(doc_id, text, lang, source))
    for e in entries:
        digest = hashlib.sha256(e.prompt.encode()).hexdigest()[:8]
        assert e.entity_id == f"scan_{e.page_num}_{digest}"


def test_urls_unique(small_documents):
    urls = {url_of(d, l, s) for d, _t, l, s in small_documents}
    assert len(urls) == len(small_documents)
