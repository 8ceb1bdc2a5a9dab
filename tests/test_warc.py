"""WARC source: record serialization round-trips (plain, per-member
gzip, whole-file gzip), the Ray datasource path, and parser
robustness on foreign/damaged input."""

from __future__ import annotations

import gzip
from datetime import datetime

import pytest

from vlm_ocr_doc_reader_ray.sources.warc import (
    iter_warc_records,
    read_warc,
    record_bytes,
    write_warc,
)


def _rows(n=40):
    return [
        {
            "url": f"https://ex{i % 5}.com/p/{i}",
            "warc_ts": datetime(2024, 3, 1, 12, 0, i % 60, i * 137 % 1000000),
            "html": f"<html><body>doc {i} éü — nested\r\n\r\nCRLFs</body></html>".encode(),
            "lang": ["en", "de", "zh"][i % 3],
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("per_member_gzip", [False, True])
def test_warc_roundtrip(tmp_path, per_member_gzip):
    rows = _rows()
    path = str(tmp_path / ("a.warc.gz" if per_member_gzip else "a.warc"))
    assert write_warc(rows, path, per_member_gzip=per_member_gzip) == len(rows)
    with open(path, "rb") as f:
        got = list(iter_warc_records(f))
    assert len(got) == len(rows)
    for a, b in zip(rows, got):
        assert (a["url"], a["warc_ts"], a["html"], a["lang"]) == (
            b["url"], b["warc_ts"], b["html"], b["lang"],
        )


def test_warc_whole_file_gzip(tmp_path):
    rows = _rows(10)
    plain = str(tmp_path / "b.warc")
    write_warc(rows, plain)
    gz = str(tmp_path / "b2.warc.gz")
    with open(plain, "rb") as f:
        data = f.read()
    with open(gz, "wb") as f:
        f.write(gzip.compress(data))
    with open(gz, "rb") as f:
        got = list(iter_warc_records(f))
    assert len(got) == 10 and got[7]["html"] == rows[7]["html"]


def test_warc_html_containing_record_delimiters(tmp_path):
    """Content-Length framing must win over delimiter scanning: html
    that embeds a fake WARC header is payload, not a record."""
    evil = b"<html>WARC/1.0\r\n\r\nWARC-Type: response\r\n\r\n</html>"
    rows = [
        {"url": "https://x.com/1", "warc_ts": datetime(2024, 1, 1), "html": evil,
         "lang": "en"},
        {"url": "https://x.com/2", "warc_ts": datetime(2024, 1, 2),
         "html": b"<html>after</html>", "lang": "de"},
    ]
    path = str(tmp_path / "c.warc")
    write_warc(rows, path)
    with open(path, "rb") as f:
        got = list(iter_warc_records(f))
    assert [g["url"] for g in got] == ["https://x.com/1", "https://x.com/2"]
    assert got[0]["html"] == evil


def test_warc_truncated_record_raises(tmp_path):
    rec = record_bytes("https://x.com/1", datetime(2024, 1, 1), b"x" * 100, "en")
    path = str(tmp_path / "d.warc")
    with open(path, "wb") as f:
        f.write(rec[: len(rec) - 60])
    with open(path, "rb") as f:
        with pytest.raises(ValueError, match="truncated"):
            list(iter_warc_records(f))


def test_read_warc_dataset_matches_writer(ray_session, tmp_path):
    rows = _rows(30)
    paths = []
    for s in range(3):
        p = str(tmp_path / f"shard-{s}.warc.gz")
        write_warc(rows[s::3], p, per_member_gzip=True)
        paths.append(p)
    df = (
        read_warc(paths, batch_rows=7)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert len(df) == 30
    import pandas as pd

    want = (
        pd.DataFrame(_rows(30))
        .sort_values("url", ignore_index=True)
    )
    assert list(df.url) == list(want.url)
    assert [bytes(h) for h in df.html] == [bytes(h) for h in want.html]
    assert list(df.lang) == list(want.lang)
    assert list(pd.to_datetime(df.warc_ts)) == list(pd.to_datetime(want.warc_ts))


def test_wet_roundtrip_and_dataset(ray_session, tmp_path):
    from datetime import datetime

    from vlm_ocr_doc_reader_ray.sources.warc import (
        _gzip_member,
        iter_wet_records,
        read_wet,
        warcinfo_bytes,
        wet_record_bytes,
    )

    texts = ["plain text", "unicode — éü中文", "with\r\n\r\nCRLF blocks", ""]
    path = str(tmp_path / "a.warc.wet.gz")
    with open(path, "wb") as f:
        f.write(_gzip_member(warcinfo_bytes("a.warc.wet.gz")))
        for i, t in enumerate(texts):
            f.write(_gzip_member(
                wet_record_bytes(f"wet://doc/{i}", datetime(2024, 1, 1, 0, 0, i), t)
            ))
    with open(path, "rb") as f:
        got = list(iter_wet_records(f))
    assert [g["text"] for g in got] == texts
    assert [g["url"] for g in got] == [f"wet://doc/{i}" for i in range(4)]

    df = read_wet([path]).to_pandas().sort_values("url", ignore_index=True)
    assert list(df.text) == texts  # url sort == write order here
    assert list(df.columns) == ["url", "warc_ts", "text"]


def test_jsonl_reader_plain_string_fields_and_tail(ray_session, tmp_path):
    """Plain (uncompressed) .jsonl, 'html' as UTF-8 string, missing
    warc_ts/lang defaults, and an unterminated tail line must all
    parse; schema matches the WARC reader's."""
    import json

    from vlm_ocr_doc_reader_ray.sources.jsonl import read_jsonl

    p = tmp_path / "shard-00000.jsonl"
    lines = [
        json.dumps({"url": "http://a/1", "html": "<p>hello</p>",
                    "lang": "en", "warc_ts": "2024-03-04T05:06:07Z"}),
        json.dumps({"url": "http://a/2", "html": "<p>wörld</p>"}),
    ]
    # second line unterminated on purpose
    p.write_bytes((lines[0] + "\n" + lines[1]).encode("utf-8"))
    df = read_jsonl([str(p)]).to_pandas().sort_values("url", ignore_index=True)
    assert list(df.columns) == ["url", "warc_ts", "html", "lang"]
    assert len(df) == 2
    assert bytes(df.html[0]) == b"<p>hello</p>"
    assert bytes(df.html[1]).decode("utf-8") == "<p>wörld</p>"
    assert df.lang[0] == "en" and df.lang[1] == ""
    assert str(df.warc_ts[0]).startswith("2024-03-04 05:06:07")


def test_jsonl_corpus_roundtrip_identity(ray_session, sf_small, tmp_path):
    """corpus_jsonl -> read_jsonl must reproduce the synthetic corpus
    rows bit-for-bit (url/lang/html/warc_ts)."""
    import os

    from vlm_ocr_doc_reader_ray.pipelines.extraction import synth_corpus
    from vlm_ocr_doc_reader_ray.sources.jsonl import corpus_jsonl, read_jsonl

    shard_dir = corpus_jsonl(sf_small, shards=3, cache_root=str(tmp_path))
    paths = sorted(os.path.join(shard_dir, p) for p in os.listdir(shard_dir))
    assert len(paths) == 3
    got = (
        read_jsonl(paths).to_pandas().sort_values("url", ignore_index=True)
    )
    want = (
        synth_corpus(sf_small)
        .select_columns(["url", "warc_ts", "html", "lang"])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert len(got) == len(want)
    assert (got.url == want.url).all()
    assert (got.lang == want.lang).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(got.html, want.html))
    assert (got.warc_ts == want.warc_ts).all()


def test_jsonl_malformed_line_fails_loudly(ray_session, tmp_path):
    """A syntactically broken JSON line must fail the read task, not
    silently drop rows."""
    import pytest
    from ray.exceptions import RayTaskError

    from vlm_ocr_doc_reader_ray.sources.jsonl import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"url": "http://a/1", "html": "x"}\n{not json}\n')
    with pytest.raises((RayTaskError, Exception)):
        read_jsonl([str(p)]).to_pandas()
