"""JSONL source: newline-delimited-JSON web corpora as a streaming
``ray.data.Dataset`` with the engine's corpus schema.

Most published webtext corpora ship as ``.jsonl`` / ``.jsonl.gz``
shards (one JSON object per line with url/text/html/metadata keys) —
the third source format next to Parquet and WARC/WET. One read task
per shard; lines stream through the same incremental inflate reader
as the WARC path (plain, whole-file gzip, or concatenated gzip
members), so a multi-GB shard never sits in a worker's heap.

Field contract per line: ``url`` (str), ``lang`` (str, default ""),
``warc_ts`` (ISO-8601 str, optional), and the page payload as either
``html`` (UTF-8 string) or ``html_b64`` (base64 — the binary-safe
form the fixture writer emits, since synthetic corrupt pages need not
be valid UTF-8). Unknown keys are ignored; rows with unparseable
JSON become ``parse_status``-style failure rows downstream (the
extractor treats undecodable html as failure-is-data), but a
syntactically broken LINE fails the read task loudly — silent row
loss is worse than a retry.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime
from typing import TYPE_CHECKING, Iterator

import pyarrow as pa

from vlm_ocr_doc_reader_ray.sources.warc import (
    _InflateReader,
    _parse_warc_date,
    _to_table,
    _warc_date,
)

if TYPE_CHECKING:
    import ray.data as rd

from ray.data.datasource import FileBasedDatasource

_DEFAULT_TS = datetime(2024, 1, 1)


def _row_from_line(line: bytes) -> dict:
    obj = json.loads(line)
    if "html_b64" in obj:
        html = base64.b64decode(obj["html_b64"])
    else:
        html = obj.get("html", "").encode("utf-8")
    ts = (
        _parse_warc_date(obj["warc_ts"])
        if obj.get("warc_ts")
        else _DEFAULT_TS
    )
    return {
        "url": obj["url"],
        "warc_ts": ts,
        "html": html,
        "lang": obj.get("lang", ""),
    }


class JsonlDatasource(FileBasedDatasource):
    """One read task per shard; JSON lines stream out in bounded
    Arrow batches (same ``(url, warc_ts, html, lang)`` schema as the
    WARC reader, so every downstream pipeline is source-agnostic)."""

    _FILE_EXTENSIONS = ["jsonl", "jsonl.gz", "json.gz", "ndjson"]

    def __init__(self, paths, batch_rows: int = 512, **kwargs) -> None:
        super().__init__(paths, **kwargs)
        self.batch_rows = batch_rows

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        r = _InflateReader(f)
        rows: list[dict] = []
        while True:
            line = r.read_until(b"\n")
            if line is None:
                leftover = bytes(r.buf)  # unterminated tail line at EOF
                if leftover.strip():
                    rows.append(_row_from_line(leftover))
                break
            if line.strip():
                rows.append(_row_from_line(line))
            if len(rows) >= self.batch_rows:
                yield _to_table(rows)
                rows = []
        if rows:
            yield _to_table(rows)


def read_jsonl(paths, batch_rows: int = 512, **kwargs) -> "rd.Dataset":
    """JSONL shard path(s) → Dataset(url, warc_ts, html, lang)."""
    import ray.data as rd

    return rd.read_datasource(
        JsonlDatasource(paths, batch_rows=batch_rows, **kwargs)
    )


def corpus_jsonl(
    sf_dir: str,
    shards: int = 4,
    cache_root: str | None = None,
    whole_file_gzip: bool = True,
) -> str:
    """Materialize (once, atomically) the synthetic corpus as
    ``.jsonl.gz`` shards; returns the shard directory. Fixture writer
    — real deployments point ``read_jsonl`` at corpora they have.
    Records round-robin over shards by row index (deterministic, one
    read task per shard)."""
    import gzip
    import os
    import shutil
    from pathlib import Path

    from vlm_ocr_doc_reader_ray.pipelines.extraction import (
        corpus_cache_root,
        synth_corpus,
    )

    root = cache_root or corpus_cache_root()
    tag = f"jsonl_{Path(sf_dir).name}_s{shards}"
    out_dir = os.path.join(root, tag)
    if os.path.isdir(out_dir):
        return out_dir
    # per-writer tmp (pid-suffixed): concurrent builders must never
    # rmtree each other's in-progress dir (see warc.py twin).
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    raw = [
        open(os.path.join(tmp_dir, f"shard-{s:05d}.jsonl.gz"), "wb")
        for s in range(shards)
    ]
    files = (
        [gzip.GzipFile(fileobj=f, mode="wb", mtime=0) for f in raw]
        if whole_file_gzip
        else raw
    )
    try:
        i = 0
        for batch in synth_corpus(sf_dir).iter_batches(
            batch_size=256, batch_format="pyarrow"
        ):
            urls = batch.column("url").to_pylist()
            tss = batch.column("warc_ts").to_pylist()
            htmls = batch.column("html").to_pylist()
            langs = batch.column("lang").to_pylist()
            for url, ts, html, lang in zip(urls, tss, htmls, langs):
                line = json.dumps(
                    {
                        "url": url,
                        "warc_ts": _warc_date(ts),
                        "lang": lang,
                        "html_b64": base64.b64encode(bytes(html)).decode("ascii"),
                    },
                    sort_keys=True,
                )
                files[i % shards].write(line.encode("utf-8") + b"\n")
                i += 1
    finally:
        for f in files:
            f.close()
        if whole_file_gzip:
            for f in raw:
                f.close()
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)  # concurrent writer won
    return out_dir
