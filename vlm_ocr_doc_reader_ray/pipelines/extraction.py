"""Flagship pipeline: corpus Parquet → extraction → outputs.

Ray lifecycle equivalent of the reference's scan/resolve/verify CLI
commands (``cli.py:166-239``) as ONE streaming job:

    read_parquet(corpus)                      # column-pruned read
      → map_batches(DocumentExtractor, ...)   # scan+resolve+verify, actor pool
      → [explode stages / sinks]

Nothing materializes the corpus: the synthesis, extraction and sink
stages stream block-by-block with backpressure. At 100 TB the only
change is the input path (and per-stage ``concurrency`` sized to the
cluster) — there is no driver-side loop anywhere.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import pyarrow as pa
import ray.data as rd

from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig
from vlm_ocr_doc_reader_ray.corpus.generator import CorpusSpec, synth_batch
from vlm_ocr_doc_reader_ray.stages.extract_stage import (
    DocumentExtractor,
    explode_headers,
    explode_registry,
)

def corpus_cache_root() -> str:
    """Synthesized-corpus cache directory, under the engine-wide
    :func:`~vlm_ocr_doc_reader_ray.state.cache.cache_root` (set
    ``$GRAFT_CACHE_ROOT`` to shared storage on a multi-node cluster;
    resolved lazily so redirection works at runtime)."""
    from vlm_ocr_doc_reader_ray.state.cache import cache_dir

    return cache_dir("vlm_ocr_ray_corpus")


def _synth_arrow(batch: pa.Table, spec: CorpusSpec) -> pa.Table:
    out = synth_batch(
        {
            "doc_id": batch.column("doc_id").to_pylist(),
            "text": batch.column("text").to_pylist(),
            "lang": batch.column("lang").to_pylist(),
            "source": batch.column("source").to_pylist(),
        },
        spec,
    )
    return pa.table(
        {
            "url": pa.array(out["url"], type=pa.string()),
            "warc_ts": pa.array(out["warc_ts"], type=pa.timestamp("us")),
            "html": pa.array(out["html"], type=pa.large_binary()),
            "text": pa.array(out["text"], type=pa.large_string()),
            "lang": pa.array(out["lang"], type=pa.string()),
        }
    )


def synth_corpus(
    sf_dir: str,
    reps: int = 1,
    override_num_blocks: Optional[int] = None,
    pdf_payload: str = "spdf",
) -> rd.Dataset:
    """documents.parquet → streaming corpus Dataset (url, warc_ts, html, text, lang).

    ``pdf_payload="pdf"`` swaps the binary-layout docs' SPDF container
    for REAL PDF bytes (same page/block layout → identical golden
    extraction, see ``extract/pdfcodec.py``)."""
    spec = CorpusSpec(reps=reps, pdf_payload=pdf_payload)
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=override_num_blocks,
    )
    return docs.map_batches(
        lambda b: _synth_arrow(b, spec), batch_format="pyarrow", batch_size=512
    )


def corpus_parquet(sf_dir: str, reps: int = 1, cache_root: Optional[str] = None) -> str:
    """Materialize (once) the corpus to Parquet; returns the directory.

    Written atomically (temp dir + rename) so concurrent/failed runs
    can't observe a half-written corpus — the same contract as the
    pipeline's checkpointed sinks.
    """
    tag = f"{Path(sf_dir).name}_r{reps}"
    out_dir = os.path.join(cache_root or corpus_cache_root(), tag)
    if os.path.isdir(out_dir):
        return out_dir
    tmp_dir = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    synth_corpus(sf_dir, reps).write_parquet(tmp_dir)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        # another process won the race; theirs is equivalent (deterministic)
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def read_corpus(sf_dir: str, reps: int = 1, materialized: bool = False) -> rd.Dataset:
    if materialized:
        path = corpus_parquet(sf_dir, reps)
        return rd.read_parquet(path)
    return synth_corpus(sf_dir, reps)


def extract(
    corpus: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    axes: Sequence[int] = (1, 3, 5),
    emit_spans: bool = True,
    emit_registry: bool = True,
    concurrency: Optional[int] = None,
) -> rd.Dataset:
    """corpus → extracted Dataset (see stages/extract_stage.py schema).

    ``concurrency=None`` → stateless tasks (fully elastic; right for
    this CPU-light per-row kernel). Pass an int to pin an actor pool,
    e.g. when a future extractor loads heavy models.
    """
    fn_kwargs = dict(cfg=cfg, axes=tuple(axes), emit_spans=emit_spans, emit_registry=emit_registry)
    if concurrency is None:
        extractor = DocumentExtractor(**fn_kwargs)
        return corpus.map_batches(
            extractor,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
    return corpus.map_batches(
        DocumentExtractor,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=concurrency,
        num_cpus=cfg.extract_num_cpus,
    )


def registry_table(extracted: rd.Dataset) -> rd.Dataset:
    """Exploded registry: one row per entity (SURVEY table `registry`)."""
    return extracted.select_columns(["url", "registry"]).map_batches(
        explode_registry, batch_format="pyarrow"
    )


def headers_table(extracted: rd.Dataset) -> rd.Dataset:
    return extracted.select_columns(["url", "headers"]).map_batches(
        explode_headers, batch_format="pyarrow"
    )


def pages_block_table(sf_dir: str) -> rd.Dataset:
    """Alternate ingest form (reference S4: pre-rendered page arrays):
    one flat row per layout block
    (url, page_num, width, height, x0, y0, x1, y1, text, font_size)."""
    from vlm_ocr_doc_reader_ray.corpus.generator import (
        is_corrupt_doc,
        layout_pages,
        url_of,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    def flatten(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in
                ["url", "page_num", "width", "height", "x0", "y0", "x1", "y1",
                 "text", "font_size"]}
        for doc_id, text, lang, source in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist(),
            batch.column("lang").to_pylist(), batch.column("source").to_pylist(),
        ):
            doc_id = int(doc_id)
            if is_corrupt_doc(doc_id):
                continue
            url = url_of(doc_id, lang, source)
            for page in layout_pages(doc_id, text, lang, source):
                for b in page["blocks"]:
                    cols["url"].append(url)
                    cols["page_num"].append(page["page_num"])
                    cols["width"].append(page["width"])
                    cols["height"].append(page["height"])
                    for k in ("x0", "y0", "x1", "y1", "text", "font_size"):
                        cols[k].append(b[k])
        return pa.table(
            {
                "url": pa.array(cols["url"], type=pa.string()),
                "page_num": pa.array(cols["page_num"], type=pa.int64()),
                "width": pa.array(cols["width"], type=pa.float32()),
                "height": pa.array(cols["height"], type=pa.float32()),
                "x0": pa.array(cols["x0"], type=pa.float32()),
                "y0": pa.array(cols["y0"], type=pa.float32()),
                "x1": pa.array(cols["x1"], type=pa.float32()),
                "y1": pa.array(cols["y1"], type=pa.float32()),
                "text": pa.array(cols["text"], type=pa.large_string()),
                "font_size": pa.array(cols["font_size"], type=pa.float32()),
            }
        )

    return docs.map_batches(flatten, batch_format="pyarrow")


def extract_from_pages(blocks: rd.Dataset) -> rd.Dataset:
    """Flat block rows → (url, extracted_text, text_sha256).

    The G4 ordered-concat under a real shuffle: blocks arrive in
    arbitrary partition order; ``groupby(url)`` co-locates a document,
    the group fn rebuilds pages by ``page_num``, XY-cuts each, and
    assembles — ordering restored from data columns, never from block
    arrival order."""
    import hashlib

    import pandas as pd

    from vlm_ocr_doc_reader_ray.extract.pdf_extractor import extract_layout
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def rebuild_part(g: pd.DataFrame) -> pd.DataFrame:
        """One hash partition (urls co-located): sort once, slice doc
        and page boundaries from numpy arrays (no per-key Ray dispatch
        and no iterrows — the per-doc XY-cut itself is irreducible)."""
        out_urls, out_texts, out_hashes = [], [], []
        if not g.empty:
            g = g.sort_values(["url", "page_num"], kind="mergesort")
            cols = {c: g[c].to_numpy() for c in g.columns}
            import numpy as np

            urls = cols["url"]
            doc_starts = np.concatenate(
                [[0], np.nonzero(urls[1:] != urls[:-1])[0] + 1, [len(urls)]]
            )
            for d0, d1 in zip(doc_starts[:-1], doc_starts[1:]):
                pages = []
                pnums = cols["page_num"][d0:d1]
                page_starts = np.concatenate(
                    [[0], np.nonzero(pnums[1:] != pnums[:-1])[0] + 1, [len(pnums)]]
                )
                for p0, p1 in zip(page_starts[:-1], page_starts[1:]):
                    s = slice(d0 + p0, d0 + p1)
                    pages.append(
                        {
                            "page_num": int(pnums[p0]),
                            "width": float(cols["width"][d0 + p0]),
                            "height": float(cols["height"][d0 + p0]),
                            "blocks": [
                                {
                                    "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                                    "text": t, "font_size": f,
                                }
                                for x0, y0, x1, y1, t, f in zip(
                                    cols["x0"][s], cols["y0"][s], cols["x1"][s],
                                    cols["y1"][s], cols["text"][s], cols["font_size"][s],
                                )
                            ],
                        }
                    )
                res = extract_layout(pages)
                out_urls.append(urls[d0])
                out_texts.append(res.text)
                out_hashes.append(hashlib.sha256(res.text.encode()).hexdigest())
        return pd.DataFrame(
            {
                "url": pd.Series(out_urls, dtype="object"),
                "extracted_text": pd.Series(out_texts, dtype="object"),
                "text_sha256": pd.Series(out_hashes, dtype="object"),
            }
        )

    return partitioned_apply(blocks, ["url"], rebuild_part)


def span_stats_table(extracted: rd.Dataset) -> rd.Dataset:
    """Per-url span bookkeeping invariants (n/spans coverage/end).

    Numerically verifies the prefix-sum offset computation: kept spans
    must tile the text exactly, separated by the 2-char block joiner.
    """

    def stats(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        ns, chars, ends = [], [], []
        for spans in batch.column("spans").to_pylist():
            ns.append(len(spans))
            chars.append(sum(s["end"] - s["start"] for s in spans))
            ends.append(max((s["end"] for s in spans), default=0))
        return pa.table(
            {
                "url": urls,
                "n_spans": pa.array(ns, type=pa.int64()),
                "span_chars": pa.array(chars, type=pa.int64()),
                "last_span_end": pa.array(ends, type=pa.int64()),
            }
        )

    return extracted.select_columns(["url", "spans"]).map_batches(
        stats, batch_format="pyarrow"
    )


def page_states_table(extracted: rd.Dataset) -> rd.Dataset:
    """Per-page resolution status (reference ``page_states`` dict,
    ``core/state.py:142``): every page of a parsed doc reaches
    'verified'; failed parses surface as page 1 / 'none'."""

    def _expand(batch: pa.Table) -> pa.Table:
        urls, pages, statuses = [], [], []
        for url, pc_, st in zip(
            batch.column("url").to_pylist(),
            batch.column("page_count").to_pylist(),
            batch.column("parse_status").to_pylist(),
        ):
            if st != "ok":
                urls.append(url)
                pages.append(1)
                statuses.append("none")
                continue
            for p in range(1, pc_ + 1):
                urls.append(url)
                pages.append(p)
                statuses.append("verified")
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "page_num": pa.array(pages, type=pa.int64()),
                "status": pa.array(statuses, type=pa.string()),
            }
        )

    return extracted.select_columns(["url", "page_count", "parse_status"]).map_batches(
        _expand, batch_format="pyarrow"
    )
