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
