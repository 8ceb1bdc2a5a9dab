"""Defensive parsing / sanitization contracts (reference
``operations/scan.py:70-123``, ``core/state.py:25-42,158-163``,
``operations/full_description.py:304-346``) and the chunked-resolve
alignment contract (``core/reader.py:297-363``)."""

import pyarrow as pa

from vlm_ocr_doc_reader_ray.extract.registry import (
    RegistryEntry,
    chunked_resolve,
    resolve_entry,
    scan_entities,
)
from vlm_ocr_doc_reader_ray.extract.sanitize import (
    clean_json_fence,
    coerce_page_num,
    coerce_resolution,
    parse_scan_payload,
    sanitize_headers,
    sanitize_registry_batch,
)


class TestFenceAndPayload:
    def test_fence_stripping(self):
        assert clean_json_fence('```json\n{"a": 1}\n```') == '{"a": 1}'
        assert clean_json_fence('```\n{"a": 1}\n```') == '{"a": 1}'
        assert clean_json_fence('{"a": 1}') == '{"a": 1}'

    def test_fence_embedded_in_prose(self):
        # reference contract: the fence can appear ANYWHERE in the text
        assert (
            clean_json_fence('Here is the JSON:\n```json\n{"a": 1}\n```\nthanks')
            == '{"a": 1}'
        )
        assert clean_json_fence('prefix ```{"b": 2}``` suffix') == '{"b": 2}'

    def test_valid_payload(self):
        p = parse_scan_payload(
            '```json{"text": "hi", "structure": {"headers": '
            '[{"level": 1, "title": "T", "page": 2}]}, "ocr_registry": [{"x": 1}]}```'
        )
        assert p["text"] == "hi"
        assert p["structure"]["headers"] == [{"level": 1, "title": "T", "page": 2}]
        assert p["ocr_registry"] == [{"x": 1}]

    def test_broken_payload_is_empty_not_raise(self):
        for bad in ["not json", "[]", '{"text": 5, "structure": "x"}', ""]:
            p = parse_scan_payload(bad)
            assert p["structure"] == {"headers": []}
            assert isinstance(p["text"], str)
            assert p["ocr_registry"] == []


class TestCoercions:
    def test_resolution(self):
        assert coerce_resolution(2) == 2
        for bad in (None, "x", 3, -1, 2.5):
            assert coerce_resolution(bad) in (0, 2)  # 2.5 -> int() == 2
        assert coerce_resolution(3) == 0
        assert coerce_resolution("1") == 1

    def test_page_num(self):
        assert coerce_page_num(3) == 3
        assert coerce_page_num("4") == 4
        assert coerce_page_num(0, fallback=7) == 7
        assert coerce_page_num(None) is None

    def test_headers_dropped_when_incomplete(self):
        raw = [
            {"level": 1, "title": "ok", "page": 1},
            {"level": 1, "page": 1},          # no title
            {"title": "x", "page": 1},        # no level
            {"level": 0, "title": "x", "page": 1},  # invalid level
            "junk",
        ]
        assert sanitize_headers(raw) == [{"level": 1, "title": "ok", "page": 1}]


def _reg_table(rows):
    cols = {
        "entity_id": [], "page_num": [], "resolution": [],
    }
    for eid, page, res in rows:
        cols["entity_id"].append(eid)
        cols["page_num"].append(page)
        cols["resolution"].append(res)
    return pa.table(
        {
            "entity_id": pa.array(cols["entity_id"], type=pa.string()),
            "page_num": pa.array(cols["page_num"], type=pa.int64()),
            "resolution": pa.array(cols["resolution"], type=pa.int64()),
        }
    )


def test_sanitize_registry_batch():
    t = _reg_table(
        [("a", 1, 2), ("", 1, 1), ("b", -1, 1), ("c", 3, 9)]
    )
    out = sanitize_registry_batch(t)
    assert out.column("entity_id").to_pylist() == ["a", "c"]
    assert out.column("resolution").to_pylist() == [2, 0]  # 9 coerced


class TestChunkedResolve:
    TEXT = (
        "Contact a@b.example.com today. Call +1-555-0100 now. "
        "Date 2023-01-02 matters. ID REF-123456 noted. "
        "See https://x.example.org/page for more."
    )

    def _entries(self):
        from vlm_ocr_doc_reader_ray.extract.blocks import ExtractResult

        r = ExtractResult()
        r.text = self.TEXT
        r.spans = [(0, len(self.TEXT), "p", 0)]
        r._page_of_span[(0, len(self.TEXT))] = 1
        return scan_entities(r)

    def test_chunked_equals_pointwise(self):
        entries = self._entries()
        assert len(entries) == 5
        for chunk_size in (1, 2, 5, 100):
            chunked = chunked_resolve(entries, self.TEXT, chunk_size=chunk_size)
            pointwise = [resolve_entry(e, self.TEXT) for e in entries]
            assert chunked == pointwise, chunk_size

    def test_malformed_entry_padded_as_error(self):
        entries = self._entries()
        broken = RegistryEntry(
            entity_id="scan_1_ffffffff", page_num=1, kind="email",
            prompt="p", resolution=0, value="orig", context=None,
            verified=False, confidence=None, span_start=99999, span_end=100005,
        )
        out = chunked_resolve(entries + [broken], self.TEXT, chunk_size=2)
        assert len(out) == 6
        bad = out[-1]
        assert bad.status == "error"
        assert bad.resolution == 1
        assert bad.value == "orig"  # original preserved on failure
        # healthy entries unaffected by the broken neighbour
        assert all(e.status == "ok" for e in out[:-1])
