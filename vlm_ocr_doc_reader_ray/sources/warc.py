"""WARC source: read Common-Crawl-style web archives as a streaming
``ray.data.Dataset`` with the engine's corpus schema.

The north rule's input is "Common-Crawl-style web pages"; on a real
crawl those arrive as WARC shards, not Parquet. This module adds a
``FileBasedDatasource`` that parses WARC/1.0 ``response`` records
into ``(url, warc_ts, html, lang)`` rows — one read task per shard,
records streamed in bounded batches, never a whole file in one
Python list — plus a writer used to synthesize deterministic test
shards from the corpus (real deployments read archives they already
have; the writer is the fixture, the READER is the operator).

Format notes (public WARC/1.0 spec, ISO 28500):
- a record is a header block (``WARC/1.0`` + ``Name: value`` lines,
  CRLF) then ``Content-Length`` body bytes, then CRLF CRLF;
- ``response`` records wrap an HTTP response; the page bytes are the
  HTTP body after the first CRLF CRLF;
- Common Crawl stores each record as its own gzip member,
  concatenated into ``.warc.gz``; ``zlib`` with ``MAX_WBITS|16``
  decodes member-at-a-time, so the reader handles plain, whole-file
  gzip, and per-member gzip identically through one inflate loop.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import TYPE_CHECKING, Iterable, Iterator

import pyarrow as pa

if TYPE_CHECKING:
    import ray.data as rd

CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def _warc_date(ts: datetime) -> str:
    ts = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
    base = ts.strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}.{ts.microsecond:06d}Z" if ts.microsecond else base + "Z"


def _parse_warc_date(s: str) -> datetime:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return datetime.strptime(s, fmt)


def record_bytes(url: str, ts: datetime, html: bytes, lang: str) -> bytes:
    """One WARC/1.0 response record wrapping a minimal HTTP response."""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: text/html; charset=utf-8" + CRLF
        + b"Content-Language: " + lang.encode("ascii") + CRLF
        + b"Content-Length: " + str(len(html)).encode("ascii") + CRLF
        + CRLF
        + html
    )
    header = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + _warc_date(ts).encode("ascii") + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http)).encode("ascii") + CRLF
        + CRLF
    )
    return header + http + CRLF + CRLF


def warcinfo_bytes(filename: str) -> bytes:
    body = b"software: vlm-ocr-doc-reader-ray\r\nformat: WARC File Format 1.0\r\n"
    return (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: warcinfo" + CRLF
        + b"WARC-Filename: " + filename.encode("utf-8") + CRLF
        + b"WARC-Date: 2024-01-01T00:00:00Z" + CRLF
        + b"Content-Type: application/warc-fields" + CRLF
        + b"Content-Length: " + str(len(body)).encode("ascii") + CRLF
        + CRLF + body + CRLF + CRLF
    )


def write_warc(
    rows: Iterable[dict], path: str, per_member_gzip: bool = False
) -> int:
    """Serialize rows (url, warc_ts, html, lang) to one WARC shard.

    ``per_member_gzip=True`` writes the Common Crawl layout (each
    record its own gzip member). Returns the record count."""
    n = 0
    with open(path, "wb") as f:
        info = warcinfo_bytes(path.rsplit("/", 1)[-1])
        if per_member_gzip:
            f.write(_gzip_member(info))
        else:
            f.write(info)
        for r in rows:
            rec = record_bytes(r["url"], r["warc_ts"], bytes(r["html"]), r["lang"])
            f.write(_gzip_member(rec) if per_member_gzip else rec)
            n += 1
    return n


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    return co.compress(data) + co.flush()


class _InflateReader:
    """Incremental reader over plain / gzip / multi-member-gzip bytes
    exposing ``read_until(delim)`` and ``read_exact(n)`` without ever
    materializing the whole decompressed shard."""

    CHUNK = 1 << 18

    def __init__(self, f) -> None:
        head = f.read(2)
        self.gz = head == _GZ_MAGIC
        self.f = f
        self.raw_tail = head if self.gz else b""
        self.d = zlib.decompressobj(zlib.MAX_WBITS | 16) if self.gz else None
        self.buf = bytearray() if self.gz else bytearray(head)
        self.eof = False

    def _pump(self) -> None:
        if self.eof:
            return
        if not self.gz:
            chunk = self.f.read(self.CHUNK)
            if not chunk:
                self.eof = True
            self.buf += chunk
            return
        raw = self.raw_tail or self.f.read(self.CHUNK)
        self.raw_tail = b""
        if not raw:
            self.eof = True
            return
        self.buf += self.d.decompress(raw)
        while self.d.eof:  # next gzip member begins in unused_data
            rest = self.d.unused_data
            if not rest.strip(b"\x00"):
                break
            self.d = zlib.decompressobj(zlib.MAX_WBITS | 16)
            self.buf += self.d.decompress(rest)

    def read_until(self, delim: bytes) -> bytes | None:
        while True:
            i = self.buf.find(delim)
            if i >= 0:
                out = bytes(self.buf[: i + len(delim)])
                del self.buf[: i + len(delim)]
                return out
            if self.eof:
                return None
            self._pump()

    def read_exact(self, n: int) -> bytes:
        while len(self.buf) < n and not self.eof:
            self._pump()
        out = bytes(self.buf[:n])
        del self.buf[:n]
        if len(out) != n:
            raise ValueError(f"truncated WARC: wanted {n} bytes, got {len(out)}")
        return out


def _iter_raw(f) -> Iterator[tuple[dict, bytes]]:
    """File-like → (header dict, body bytes) for every WARC record."""
    r = _InflateReader(f)
    while True:
        block = r.read_until(CRLF + CRLF)
        if block is None:
            return
        lines = block.split(CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            continue  # stray padding between records
        hdr: dict[bytes, bytes] = {}
        for line in lines[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                hdr[k.strip().lower()] = v.strip()
        length = int(hdr.get(b"content-length", b"0"))
        body = r.read_exact(length)
        r.read_until(CRLF + CRLF)  # record trailer
        yield hdr, body


def iter_warc_records(f) -> Iterator[dict]:
    """File-like → dicts for each ``response`` record (other record
    types — warcinfo, request, metadata — are skipped, as a
    Common-Crawl consumer does)."""
    for hdr, body in _iter_raw(f):
        if hdr.get(b"warc-type") != b"response":
            continue
        # split the HTTP envelope from the page bytes
        sep = body.find(CRLF + CRLF)
        http_hdr, html = (body[:sep], body[sep + 4 :]) if sep >= 0 else (b"", body)
        lang = ""
        for line in http_hdr.split(CRLF):
            if line.lower().startswith(b"content-language:"):
                lang = line.split(b":", 1)[1].strip().decode("ascii", "replace")
        yield {
            "url": hdr.get(b"warc-target-uri", b"").decode("utf-8"),
            "warc_ts": _parse_warc_date(hdr[b"warc-date"].decode("ascii")),
            "html": html,
            "lang": lang,
        }


def wet_record_bytes(url: str, ts: datetime, text: str) -> bytes:
    """One WET ``conversion`` record: extracted plain text, no HTTP
    envelope (the Common Crawl *.warc.wet layout)."""
    body = text.encode("utf-8")
    header = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: conversion" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + _warc_date(ts).encode("ascii") + CRLF
        + b"Content-Type: text/plain" + CRLF
        + b"Content-Length: " + str(len(body)).encode("ascii") + CRLF
        + CRLF
    )
    return header + body + CRLF + CRLF


def iter_wet_records(f) -> Iterator[dict]:
    """File-like → dicts for each ``conversion`` (WET) record."""
    for hdr, body in _iter_raw(f):
        if hdr.get(b"warc-type") != b"conversion":
            continue
        yield {
            "url": hdr.get(b"warc-target-uri", b"").decode("utf-8"),
            "warc_ts": _parse_warc_date(hdr[b"warc-date"].decode("ascii")),
            "text": body.decode("utf-8"),
        }


from ray.data.datasource import FileBasedDatasource  # noqa: E402


class WarcDatasource(FileBasedDatasource):
    """One read task per shard; records stream out in bounded Arrow
    batches so a multi-GB shard never sits in worker heap at once."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, batch_rows: int = 256, **kwargs) -> None:
        super().__init__(paths, **kwargs)
        self.batch_rows = batch_rows

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        rows: list[dict] = []
        for rec in iter_warc_records(f):
            rows.append(rec)
            if len(rows) >= self.batch_rows:
                yield _to_table(rows)
                rows = []
        if rows:
            yield _to_table(rows)


def _to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], type=pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], type=pa.large_binary()),
            "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
        }
    )


def read_warc(paths, batch_rows: int = 256, **kwargs) -> "rd.Dataset":
    """WARC shard path(s) → Dataset(url, warc_ts, html, lang)."""
    import ray.data as rd

    return rd.read_datasource(WarcDatasource(paths, batch_rows=batch_rows, **kwargs))


def corpus_warc(
    sf_dir: str,
    shards: int = 4,
    cache_root: str | None = None,
    per_member_gzip: bool = True,
) -> str:
    """Materialize (once, atomically) the synthetic corpus as WARC
    shards in the Common Crawl layout (one gzip member per record);
    returns the shard directory. Test/bench fixture — real
    deployments point ``read_warc`` at archives they already have.

    Records round-robin over shards by row index, so the fixture is
    deterministic and every shard gets work (one read task each)."""
    import os
    import shutil
    from pathlib import Path

    from vlm_ocr_doc_reader_ray.pipelines.extraction import (
        corpus_cache_root,
        synth_corpus,
    )

    root = cache_root or corpus_cache_root()
    tag = f"warc_{Path(sf_dir).name}_s{shards}"
    out_dir = os.path.join(root, tag)
    if os.path.isdir(out_dir):
        return out_dir
    # per-writer tmp (pid-suffixed): two concurrent builders (pytest
    # workers, bench + driver) must never rmtree each other's
    # in-progress dir or publish each other's half-written shards —
    # the rename below stays the single atomic publish point.
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    ext = "warc.gz" if per_member_gzip else "warc"
    files = [
        open(os.path.join(tmp_dir, f"shard-{s:05d}.{ext}"), "wb")
        for s in range(shards)
    ]
    try:
        for s, f in enumerate(files):
            info = warcinfo_bytes(f"shard-{s:05d}.{ext}")
            f.write(_gzip_member(info) if per_member_gzip else info)
        i = 0
        for batch in synth_corpus(sf_dir).iter_batches(
            batch_size=256, batch_format="pyarrow"
        ):
            urls = batch.column("url").to_pylist()
            tss = batch.column("warc_ts").to_pylist()
            htmls = batch.column("html").to_pylist()
            langs = batch.column("lang").to_pylist()
            for url, ts, html, lang in zip(urls, tss, htmls, langs):
                rec = record_bytes(url, ts, bytes(html), lang)
                files[i % shards].write(
                    _gzip_member(rec) if per_member_gzip else rec
                )
                i += 1
    finally:
        for f in files:
            f.close()
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)  # concurrent writer won
    return out_dir


class WetDatasource(FileBasedDatasource):
    """WET (conversion) shards → (url, warc_ts, text) rows."""

    _FILE_EXTENSIONS = ["wet", "warc.wet", "warc.wet.gz", "wet.gz"]

    def __init__(self, paths, batch_rows: int = 512, **kwargs) -> None:
        super().__init__(paths, **kwargs)
        self.batch_rows = batch_rows

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        rows: list[dict] = []
        for rec in iter_wet_records(f):
            rows.append(rec)
            if len(rows) >= self.batch_rows:
                yield _wet_table(rows)
                rows = []
        if rows:
            yield _wet_table(rows)


def _wet_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], type=pa.timestamp("us")
            ),
            "text": pa.array([r["text"] for r in rows], type=pa.large_string()),
        }
    )


def read_wet(paths, batch_rows: int = 512, **kwargs) -> "rd.Dataset":
    """WET shard path(s) → Dataset(url, warc_ts, text)."""
    import ray.data as rd

    return rd.read_datasource(WetDatasource(paths, batch_rows=batch_rows, **kwargs))


def corpus_wet(
    sf_dir: str, shards: int = 4, cache_root: str | None = None
) -> str:
    """Materialize (once, atomically) documents.parquet as WET shards
    (per-member gzip); url embeds doc_id as ``wet://doc/{doc_id}`` so
    text-keyed pipelines can recover the key after the round-trip."""
    import os
    import shutil
    from datetime import datetime
    from pathlib import Path

    import ray.data as rd

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_cache_root

    root = cache_root or corpus_cache_root()
    tag = f"wet_{Path(sf_dir).name}_s{shards}"
    out_dir = os.path.join(root, tag)
    if os.path.isdir(out_dir):
        return out_dir
    # per-writer tmp (pid-suffixed): two concurrent builders (pytest
    # workers, bench + driver) must never rmtree each other's
    # in-progress dir or publish each other's half-written shards —
    # the rename below stays the single atomic publish point.
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir)
    files = [
        open(os.path.join(tmp_dir, f"shard-{s:05d}.warc.wet.gz"), "wb")
        for s in range(shards)
    ]
    try:
        for s, f in enumerate(files):
            f.write(_gzip_member(warcinfo_bytes(f"shard-{s:05d}.warc.wet.gz")))
        i = 0
        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        for batch in docs.iter_batches(batch_size=512, batch_format="pyarrow"):
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                rec = wet_record_bytes(
                    f"wet://doc/{doc_id}", datetime(2024, 1, 1), text
                )
                files[i % shards].write(_gzip_member(rec))
                i += 1
    finally:
        for f in files:
            f.close()
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir
