"""The extraction actor-pool stage (the engine's hot path).

Replaces the reference's Level-0/1/2 reader loop
(``core/reader.py:128-215,237-275,427-532``) with one batched,
deterministic pass per document: parse → classify blocks → assemble
text+spans → scan entities → resolve → verify.

Designed as a callable CLASS for ``map_batches``: the recognizer regex
bank / parser tables are compiled once per actor in ``__init__`` (the
reference's "warm client" state, ``core/processor.py:82-136``), and
``__call__`` handles one zero-copy Arrow batch. With
``concurrency=None`` Ray runs it as stateless tasks — still correct,
because all state is read-only after init.

Output schema (one row per input row; spans/headers/registry carried
as ``list<struct>`` columns so downstream explodes need no re-parse):

    url, lang, extracted_text, text_sha256, n_blocks_kept,
    n_blocks_dropped, parse_status, page_count,
    headers: list<struct<level,title,page>>,
    spans:   list<struct<start,end,kind,source_block>>,
    registry:list<struct<entity_id,page_num,kind,prompt,resolution,
                         value,context,verified,confidence,
                         span_start,span_end,status>>
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import pyarrow as pa

from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig
from vlm_ocr_doc_reader_ray.extract.blocks import ExtractResult
from vlm_ocr_doc_reader_ray.extract.document import extract_document
from vlm_ocr_doc_reader_ray.extract.registry import RegistryEntry, build_registry

HEADER_T = pa.struct(
    [("level", pa.int64()), ("title", pa.large_string()), ("page", pa.int64())]
)
SPAN_T = pa.struct(
    [
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("kind", pa.string()),
        ("source_block", pa.int64()),
    ]
)
REGISTRY_T = pa.struct(
    [
        ("entity_id", pa.string()),
        ("page_num", pa.int64()),
        ("kind", pa.string()),
        ("prompt", pa.string()),
        ("resolution", pa.int64()),
        ("value", pa.string()),
        ("context", pa.string()),
        ("verified", pa.bool_()),
        ("confidence", pa.string()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("status", pa.string()),
    ]
)


class _ListStructBuilder:
    """Flat columnar builder for a list<struct> column.

    Appending per-row tuples into flat Python lists and assembling ONE
    StructArray + ListArray per batch is ~5× cheaper than
    ``pa.array(list_of_dict_lists)`` (no per-row dict allocation, no
    dict-key probing in the Arrow converter)."""

    def __init__(self, struct_type: pa.StructType) -> None:
        self.struct_type = struct_type
        self.names = [f.name for f in struct_type]
        self.cols: list[list] = [[] for _ in self.names]
        self.offsets: list[int] = [0]

    def add_row(self, tuples: Sequence[tuple]) -> None:
        for t in tuples:
            for col, v in zip(self.cols, t):
                col.append(v)
        self.offsets.append(self.offsets[-1] + len(tuples))

    def build(self) -> pa.ListArray:
        struct = pa.StructArray.from_arrays(
            [
                pa.array(col, type=self.struct_type.field(i).type)
                for i, col in enumerate(self.cols)
            ],
            names=self.names,
        )
        return pa.ListArray.from_arrays(pa.array(self.offsets, type=pa.int32()), struct)


class DocumentExtractor:
    """Actor-pool kernel: Arrow batch of corpus rows → extracted rows."""

    def __init__(
        self,
        cfg: EngineConfig = DEFAULT_CONFIG,
        axes: Sequence[int] = (1, 3, 5),
        emit_spans: bool = True,
        emit_registry: bool = True,
    ) -> None:
        # Warm state: importing the extract modules compiles the
        # recognizer regex bank and parser tables once per actor.
        self.cfg = cfg
        self.axes = tuple(axes)
        self.emit_spans = emit_spans
        self.emit_registry = emit_registry

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        langs = batch.column("lang").to_pylist()
        payloads = batch.column("html").to_pylist()

        texts: list[str] = []
        hashes: list[str] = []
        kept: list[int] = []
        dropped: list[int] = []
        status: list[str] = []
        pages: list[int] = []
        headers_b = _ListStructBuilder(HEADER_T)
        spans_b = _ListStructBuilder(SPAN_T) if self.emit_spans else None
        registry_b = _ListStructBuilder(REGISTRY_T) if self.emit_registry else None

        for payload in payloads:
            res: ExtractResult = extract_document(payload, self.cfg)
            texts.append(res.text)
            hashes.append(hashlib.sha256(res.text.encode("utf-8")).hexdigest())
            kept.append(res.n_blocks_kept)
            dropped.append(res.n_blocks_dropped)
            status.append(res.parse_status)
            pages.append(res.page_count)
            headers_b.add_row(res.headers)
            if spans_b is not None:
                spans_b.add_row(res.spans)
            if registry_b is not None:
                entries = (
                    build_registry(res, self.axes)
                    if res.parse_status == "ok"
                    else []
                )
                registry_b.add_row(
                    [
                        (
                            e.entity_id, e.page_num, e.kind, e.prompt,
                            e.resolution, e.value, e.context, e.verified,
                            e.confidence, e.span_start, e.span_end, e.status,
                        )
                        for e in entries
                    ]
                )

        cols: dict[str, pa.Array] = {
            "url": batch.column("url"),
            "lang": batch.column("lang"),
            "extracted_text": pa.array(texts, type=pa.large_string()),
            "text_sha256": pa.array(hashes, type=pa.string()),
            "n_blocks_kept": pa.array(kept, type=pa.int64()),
            "n_blocks_dropped": pa.array(dropped, type=pa.int64()),
            "parse_status": pa.array(status, type=pa.string()),
            "page_count": pa.array(pages, type=pa.int64()),
            "headers": headers_b.build(),
        }
        if spans_b is not None:
            cols["spans"] = spans_b.build()
        if registry_b is not None:
            cols["registry"] = registry_b.build()
        return pa.table(cols)


def explode_headers(batch: pa.Table) -> pa.Table:
    """extracted rows → one row per header (url, level, title, page)."""
    import pyarrow.compute as pc

    col = batch.column("headers")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    urls = pc.take(batch.column("url"), parents)
    return pa.table(
        {
            "url": urls,
            "level": flat.field("level"),
            "title": flat.field("title"),
            "page": flat.field("page"),
        }
    )


def explode_registry(batch: pa.Table) -> pa.Table:
    """extracted rows → flat registry table (one row per entity).

    The columnar twin of the reference's ``ocr_registry`` JSON list
    (``core/state.py:135-144``), exploded with zero-copy Arrow list
    kernels (list_flatten + list_parent_indices), no Python loop.
    """
    import pyarrow.compute as pc

    col = batch.column("registry")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    out = {"url": pc.take(batch.column("url"), parents)}
    for name in [f.name for f in REGISTRY_T]:
        out[name] = flat.field(name)
    return pa.table(out)
