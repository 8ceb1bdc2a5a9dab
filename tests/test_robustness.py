"""Robustness: wide rows, empty/hostile payloads, unicode — the
failure-is-data contract under a running pipeline."""

import pyarrow as pa

from vlm_ocr_doc_reader_ray.extract import extract_document
from vlm_ocr_doc_reader_ray.extract.html_extractor import extract_html

LONG_WORDS = " ".join(f"word{i}" for i in range(30))


def test_multi_megabyte_row_single_process():
    body = "".join(f"<p>{LONG_WORDS} chunk {i}</p>" for i in range(20_000))
    payload = f"<html><body>{body}</body></html>".encode()
    assert len(payload) > 4_000_000
    r = extract_document(payload)
    assert r.parse_status == "ok"
    assert r.n_blocks_kept == 20_000
    assert r.spans[-1][1] == len(r.text)


def test_unicode_content_roundtrip():
    para = "čeština příliš žluťoučký kůň úpěl ďábelské ódy " * 3
    payload = f"<html><body><p>{para.strip()}</p></body></html>".encode("utf-8")
    r = extract_html(payload)
    assert r.text == " ".join(para.split())


def test_hostile_payloads_never_raise():
    cases = [
        b"",
        b"\x00" * 64,
        b"<" * 10_000,
        b"%SPDF1\n" + b"{" * 1000,
        ("<p>" * 5_000).encode(),
        b"&" * 10_000,
        "<p>" .encode() + "   nested & entities &amp;&bogus; text here ok yes sure fine".encode(),
    ]
    for payload in cases:
        r = extract_document(payload)
        assert r.parse_status in ("ok", "empty", "failed")


def test_wide_rows_through_pipeline(ray_session):
    """A batch mixing a 4MB doc with normal docs streams through the
    Ray stage (small batch sizes keep batch × concurrency bounded)."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.config import EngineConfig
    from vlm_ocr_doc_reader_ray.pipelines.extraction import extract

    big_body = "".join(f"<p>{LONG_WORDS} chunk {i}</p>" for i in range(15_000))
    rows = [
        {"url": "https://big.example.com/0",
         "html": f"<html><body>{big_body}</body></html>".encode(),
         "lang": "en"},
    ] + [
        {"url": f"https://small.example.com/{i}",
         "html": f"<html><body><p>{LONG_WORDS} number {i}</p></body></html>".encode(),
         "lang": "en"}
        for i in range(50)
    ]
    ds = rd.from_items(rows)
    cfg = EngineConfig(extract_batch_size=8)
    out = extract(ds, cfg=cfg, emit_spans=False, emit_registry=False).to_pandas()
    assert len(out) == 51
    assert (out["parse_status"] == "ok").all()
    big = out[out["url"] == "https://big.example.com/0"].iloc[0]
    assert big["n_blocks_kept"] == 15_000
