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


def anchor_top_terms(links: rd.Dataset, k: int = 5) -> rd.Dataset:
    """Per target-host anchor-text profile — the classic web-search
    relevance signal (what the REST of the web calls a host).

    Projects each link to (target_host, anchor_text) and reuses the
    engine's integer-exact grouped top-k
    (:func:`...text_analysis.top_terms_per_group`): word residues
    pre-combine per batch, the global order is (count desc, word asc)
    with no floats, so the DuckDB mirror is bit-exact.

    → (target_host, rank, word, cnt), rank 1..k.
    """
    from vlm_ocr_doc_reader_ray.stages.text_analysis import top_terms_per_group

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "target_host": _host_expr(batch.column("href")),
                "anchor_text": batch.column("anchor_text"),
            }
        )

    proj = links.map_batches(project, batch_format="pyarrow")
    return top_terms_per_group(
        proj, group_col="target_host", text_col="anchor_text", k=k
    )


def frontier_urls(
    links: rd.Dataset, crawled: rd.Dataset, crawled_col: str = "url"
) -> rd.Dataset:
    """Crawl frontier: distinct link targets not yet crawled, with the
    number of distinct referring pages (the frontier priority signal).

    Plan shape: links collapse to distinct (href, url) pairs inside
    ``map_batches``, one residue shuffle counts distinct referrers per
    href, and the bounded (href, n_ref_pages) table is materialized
    (counters only — no payloads; at web scale the frontier residue is
    ~10× the page count but ~60 bytes/row) before the anti-join so its
    two output branches don't re-execute the link lineage. The crawled
    side is never collected on the driver: the Bloom filter builds
    distributed (:func:`...relational.bloom_from_dataset`) and only
    ~1% Bloom candidates shuffle for the exact residual check.

    → (href, n_ref_pages) for uncrawled hrefs.
    """
    from vlm_ocr_doc_reader_ray.stages.relational import bloom_anti_join_dataset

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"href": batch.column("href"), "url": batch.column("url")})
        return t.group_by(["href", "url"]).aggregate([])

    distinct_pairs = value_counts(
        links.map_batches(pairs, batch_format="pyarrow"),
        ["href", "url"],
        alias="npairs",
    )
    refs = value_counts(
        distinct_pairs, "href", alias="n_ref_pages"
    ).materialize()
    return bloom_anti_join_dataset(
        refs, crawled.select_columns([crawled_col]), "href", crawled_col
    )


def host_inlink_degree(links: rd.Dataset) -> rd.Dataset:
    """Per target-host IN-link profile — the authority-side mirror of
    :func:`host_link_degree`.

    → (host, n_inlinks, n_src_hosts, n_ref_pages): total links into
    the host, distinct source hosts, distinct referring pages. All
    three legs pre-combine to residues in ``map_batches``; the joins
    are the task-based bucketed hash join (the native pool-based join
    deadlocks when chained on small clusters).
    """
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": _host_expr(batch.column("href")),
                "src_host": _host_expr(batch.column("url")),
                "url": batch.column("url"),
            }
        )

    proj = links.map_batches(project, batch_format="pyarrow")

    def distinct(cols: list[str]):
        def _d(batch: pa.Table) -> pa.Table:
            return batch.select(cols).group_by(cols).aggregate([])

        return _d

    n_in = value_counts(proj, "host", alias="n_inlinks")
    n_src = value_counts(
        value_counts(
            proj.map_batches(distinct(["host", "src_host"]), batch_format="pyarrow"),
            ["host", "src_host"],
            alias="np1",
        ),
        "host",
        alias="n_src_hosts",
    )
    n_pages = value_counts(
        value_counts(
            proj.map_batches(distinct(["host", "url"]), batch_format="pyarrow"),
            ["host", "url"],
            alias="np2",
        ),
        "host",
        alias="n_ref_pages",
    )
    j1 = partitioned_hash_join(n_in, n_src, "host", "host", num_buckets=4)
    j2 = partitioned_hash_join(j1, n_pages, "host", "host", num_buckets=4)
    return j2.map_batches(
        lambda b: b.select(["host", "n_inlinks", "n_src_hosts", "n_ref_pages"]),
        batch_format="pyarrow",
    )


def host_authority(links: rd.Dataset) -> rd.Dataset:
    """One integer power-iteration of link authority per host.

    ``authority(v) = Σ over edges u→v of inlinks(u)`` — the 2-step
    inlink mass (an eigenvector-centrality / PageRank numerator step
    kept in exact int64, so the DuckDB mirror is bit-exact; damping
    and normalization are float cosmetics applied after the ranking,
    not part of the order).

    Plan shape: the corpus-sized link stream collapses ONCE to the
    weighted host-edge residue (src, dst, cnt) — web graphs: ~1e8
    distinct host pairs — and every later step (in-degree sum, the
    edge⋈in-degree hash join, the authority re-sum) moves residues
    only. Iterating k steps = repeating the join+sum on the same edge
    residue, which a caller can checkpoint once and reuse.

    → (host, n_inlinks, authority).
    """
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": _host_expr(batch.column("url")),
                "dst": _host_expr(batch.column("href")),
            }
        )

    edges = value_counts(
        links.map_batches(project, batch_format="pyarrow"),
        ["src", "dst"],
        alias="cnt",
    ).materialize()  # bounded: distinct host pairs; two consumers below

    indeg = grouped_sums(
        edges.map_batches(
            lambda b: pa.table({"host": b.column("dst"), "n_inlinks": b.column("cnt")}),
            batch_format="pyarrow",
        ),
        "host",
        ["n_inlinks"],
    )

    # weight each edge by its SOURCE's in-degree, then re-sum per dst.
    # INNER join is exact here: an edge whose source has no inlinks
    # contributes cnt*0 = 0, so dropping it never changes a sum —
    # and every authority recipient is by definition an inlink
    # recipient, so the zero-padded union below restores hosts whose
    # every contribution was zero (left-outer semantics, no join).
    j = partitioned_hash_join(
        edges,
        indeg.map_batches(
            lambda b: pa.table(
                {"src": b.column("host"), "src_in": b.column("n_inlinks")}
            ),
            batch_format="pyarrow",
        ),
        "src",
        "src",
        num_buckets=4,
    )

    def weigh(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("dst"),
                "n_inlinks": pa.array([0] * len(batch), type=pa.int64()),
                "authority": pc.multiply(
                    pc.cast(batch.column("cnt"), pa.int64()),
                    pc.cast(batch.column("src_in"), pa.int64()),
                ),
            }
        )

    def pad(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "n_inlinks": batch.column("n_inlinks"),
                "authority": pa.array([0] * len(batch), type=pa.int64()),
            }
        )

    both = indeg.map_batches(pad, batch_format="pyarrow").union(
        j.map_batches(weigh, batch_format="pyarrow")
    )
    return grouped_sums(both, "host", ["n_inlinks", "authority"])


def page_outdegree_hist(links: rd.Dataset, pages: rd.Dataset) -> rd.Dataset:
    """Out-degree distribution over ALL pages — the graph-shape
    profile (a heavy zero bucket means parse failures or non-HTML;
    a fat tail means link farms).

    Zero-link pages (PDF/corrupt payloads here) are restored by
    unioning a zero row per page with the per-page link counts —
    union + re-sum instead of an outer join, so nothing but (url,
    count) residues ever shuffles.

    → (outdeg, n_pages).
    """

    def zero(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "outdeg": pa.array([0] * len(batch), type=pa.int64()),
            }
        )

    def per_batch(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            batch.column("url").combine_chunks()
            if isinstance(batch.column("url"), pa.ChunkedArray)
            else batch.column("url")
        )
        return pa.table(
            {
                "url": vc.field("values"),
                "outdeg": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    both = pages.select_columns(["url"]).map_batches(
        zero, batch_format="pyarrow"
    ).union(links.map_batches(per_batch, batch_format="pyarrow"))
    per_page = grouped_sums(both, "url", ["outdeg"])
    return value_counts(per_page, "outdeg", alias="n_pages")
