"""Link-graph stages: outlink table + host-level degree aggregates.

Beyond-reference web-scale operators (the reference's VLM scan keeps
no markup — ``operations/scan.py:22-67``): the outlink table feeds URL
frontiers, host-authority scoring and anchor-text mining. Built
Ray-Data-first:

- :func:`links_table` is a stateless ``map_batches`` flat-map — the
  per-payload tag scan is inherent row work (same shape as the
  extraction kernel), everything around it is Arrow;
- :func:`host_link_degree` never shuffles raw links: per-batch
  combiners reduce to (host, sums) and distinct (host, target_host)
  residues, so the all-to-all moves O(hosts + distinct host pairs),
  not O(links).

At 10^12 documents the outlink table is ~50× the page count; the
degree aggregate's shuffle stays proportional to distinct host pairs
(web graphs: ~10^8), which a 256-node cluster absorbs in one pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vlm_ocr_doc_reader_ray.extract.links import extract_links
from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums, value_counts

_HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#]+)"

LINK_COLUMNS = ["url", "pos", "href", "anchor_text", "chrome"]


def _links_batch(batch: pa.Table) -> pa.Table:
    urls: list[str] = []
    poss: list[int] = []
    hrefs: list[str] = []
    anchors: list[str] = []
    chromes: list[bool] = []
    for url, payload in zip(
        batch.column("url").to_pylist(), batch.column("html").to_pylist()
    ):
        for rec in extract_links(payload, url):
            urls.append(rec["url"])
            poss.append(rec["pos"])
            hrefs.append(rec["href"])
            anchors.append(rec["anchor_text"])
            chromes.append(rec["chrome"])
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "pos": pa.array(poss, type=pa.int64()),
            "href": pa.array(hrefs, type=pa.string()),
            "anchor_text": pa.array(anchors, type=pa.string()),
            "chrome": pa.array(chromes, type=pa.bool_()),
        }
    )


def links_table(corpus: rd.Dataset) -> rd.Dataset:
    """corpus (url, html, ...) → one row per outlink.

    Columns: url, pos (0-based document order), href (absolute,
    resolved against the page url), anchor_text, chrome.
    """
    return corpus.map_batches(_links_batch, batch_format="pyarrow")


def _host_expr(col: pa.ChunkedArray) -> pa.Array:
    """Vectorized host-of-URL (lowercased authority; '' if no match)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ex = pc.extract_regex(col, _HOST_PATTERN)
    host = pc.struct_field(ex, "host")
    return pc.utf8_lower(pc.fill_null(host, ""))


def host_link_degree(links: rd.Dataset) -> rd.Dataset:
    """Per page-host link profile — the host-authority residue table.

    → (host, n_links, n_chrome, n_external, n_distinct_targets):
    external = the target host differs from the page host;
    n_distinct_targets = distinct destination URLs (the host's
    frontier size). Both legs pre-combine inside ``map_batches`` so
    only residues shuffle.
    """

    def project(batch: pa.Table) -> pa.Table:
        host = _host_expr(batch.column("url"))
        thost = _host_expr(batch.column("href"))
        chrome = pc.cast(batch.column("chrome"), pa.int64())
        ext = pc.cast(pc.not_equal(host, thost), pa.int64())
        return pa.table(
            {
                "host": host,
                "one": pa.array([1] * len(batch), type=pa.int64()),
                "is_chrome": chrome,
                "is_external": ext,
            }
        )

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "host": _host_expr(batch.column("url")),
                "target": batch.column("href"),
            }
        )
        return t.group_by(["host", "target"]).aggregate([])

    sums = grouped_sums(
        links.map_batches(project, batch_format="pyarrow"),
        "host",
        ["one", "is_chrome", "is_external"],
    )
    distinct_pairs = value_counts(
        links.map_batches(pairs, batch_format="pyarrow"),
        ["host", "target"],
        alias="npairs",
    )
    targets = value_counts(distinct_pairs, "host", alias="n_distinct_targets")

    from vlm_ocr_doc_reader_ray.stages.relational import native_hash_join

    joined = native_hash_join(sums, targets, "host", "host", num_partitions=4)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "n_links": batch.column("one"),
                "n_chrome": batch.column("is_chrome"),
                "n_external": batch.column("is_external"),
                "n_distinct_targets": batch.column("n_distinct_targets"),
            }
        )

    return joined.map_batches(rename, batch_format="pyarrow")
