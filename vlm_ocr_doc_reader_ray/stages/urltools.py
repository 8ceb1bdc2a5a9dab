"""URL parsing + normalization for web-crawl pipelines.

Crawl dedup/partitioning is keyed by normalized URL and host, so the
parse must be deterministic and cheap. One compiled regex (shared
Python-re ∩ RE2 syntax, so the DuckDB oracle runs the SAME pattern)
splits scheme/host/port/path/query; normalization is the standard
crawl canon: lowercase scheme+host, drop default ports (80/http,
443/https), drop the fragment, keep the query, empty path → ``/``.

Pure vectorized projection — pandas ``.str`` kernels, no shuffle.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

# groups: 1 scheme, 2 host, 3 port, 4 path, 5 query (fragment dropped)
URL_RE = r"^(https?)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

_DEFAULT_PORTS = {"http": 80, "https": 443}


def parse_urls(
    ds: rd.Dataset, url_col: str = "url", id_col: str = "doc_id"
) -> rd.Dataset:
    """→ (id, scheme, host, port, path, depth, is_https, url_norm).

    ``port`` is -1 when absent OR equal to the scheme default (the
    normalized form); non-matching URLs get NULL scheme/host, empty
    path, depth 0, url_norm '' — failure is data."""

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[url_col].astype(str)
        g = u.str.extract(URL_RE)
        scheme = g[0].str.lower()
        host = g[1].str.lower()
        port = pd.to_numeric(g[2], errors="coerce")
        # default-port strip: the normalized port is -1 when it equals
        # the scheme default
        default = scheme.map(_DEFAULT_PORTS)
        port = port.where(port.ne(default), other=pd.NA)
        port_i = port.fillna(-1).astype("int64")
        path = g[3].fillna("")
        path = path.where(path != "", "/")
        stripped = path.str.strip("/")
        depth = (stripped.str.count("/") + 1).where(stripped != "", 0).astype("int64")
        port_str = (":" + port_i.astype(str)).where(port.notna(), "")
        query_str = ("?" + g[4]).fillna("")
        norm = scheme + "://" + host + port_str + path + query_str
        ok = scheme.notna()
        # empty strings, not NULLs, for unparseable rows: keeps the
        # columns null-free so engine/oracle string compares are exact
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "scheme": scheme.fillna(""),
                "host": host.fillna(""),
                "port": port_i.where(ok, -1),
                "path": path.where(ok, ""),
                "depth": depth.where(ok, 0),
                "is_https": scheme.eq("https").fillna(False),
                "url_norm": norm.where(ok, ""),
            }
        )

    return ds.map_batches(parse, batch_format="pandas")


def url_dedup(
    ds: rd.Dataset, url_col: str = "url", id_col: str = "doc_id"
) -> rd.Dataset:
    """Canonical-URL deduplication — the crawl-side dedup that runs
    BEFORE any content hash (CC/C4-style: the same page fetched as
    ``http://Host:80/a#x`` and ``http://host/a`` is one document):
    normalize via :func:`parse_urls`, drop unparseable rows, keep the
    minimum ``id_col`` per ``url_norm``. → ``(url_norm, doc_id,
    n_dupes)`` with ``n_dupes`` = total rows sharing the canonical
    form.

    Reference analog: none — beyond-reference crawl op. DuckDB
    mirror: ``sqlmirror.URL_DEDUP_SQL`` (a GROUP BY over the
    URL_PARSE_SQL canonicalization).

    Per-batch combiner first (min id + partial count per canonical
    URL inside each batch), then ONE residue hash-partition by
    ``url_norm`` merges the partials — duplicate-heavy crawls
    collapse before the shuffle moves anything."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    parsed = parse_urls(ds, url_col=url_col, id_col=id_col).select_columns(
        [id_col, "url_norm"]
    )

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["url_norm"] != ""]
        g = batch.groupby("url_norm", sort=False)[id_col]
        out = g.min().reset_index(name=id_col)
        out["n_dupes"] = g.size().to_numpy().astype("int64")
        out[id_col] = out[id_col].astype("int64")
        return out

    partial = parsed.map_batches(combine, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gr = g.groupby("url_norm", sort=False)
        out = gr[id_col].min().reset_index(name=id_col)
        out["n_dupes"] = gr["n_dupes"].sum().to_numpy().astype("int64")
        out[id_col] = out[id_col].astype("int64")
        return out

    return partitioned_apply(partial, ["url_norm"], merge)
