"""Per-host corpus metrics: the salted / pre-aggregated groupby demo.

At 10^12 documents a naive ``groupby(host)`` is an all-to-all shuffle
of every row, and web host distributions are heavily skewed (one host
can be 10% of the corpus). The scale pattern used here:

1. **partial aggregation inside map_batches** — each Arrow batch
   collapses to at most one row per distinct host in the batch
   (pyarrow ``Table.group_by``, vectorized). This is the combiner: the
   shuffle then moves only ~(hosts × blocks) tiny rows, not documents.
2. the final ``groupby(host).sum`` runs over partials. Skewed hosts
   are harmless because their per-batch partials are already merged —
   the "salt" is effectively the batch id, with the merge done by the
   same associative sum, so no explicit salt column is needed for
   sum-shaped aggregates. (For non-associative aggregates, add an
   explicit ``salt = hash(url) % S`` column and a second merge stage.)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum


def _host_of(urls: pa.ChunkedArray) -> pa.Array:
    """Host-of-URL — the ENGINE-WIDE rule: lowercased authority
    between scheme:// and the first /?#, '' on no match. Must stay
    identical to ``stages/linkgraph._host_expr`` — ``host_profile``
    inner-joins the extraction layer to the graph layer on this key,
    and a casing or query-string divergence would silently drop
    hosts from the join."""
    st = pc.extract_regex(
        urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#]+)",
    )
    host = st.field("host") if hasattr(st, "field") else pc.struct_field(st, "host")
    return pc.utf8_lower(pc.fill_null(host, ""))


def _partial(batch: pa.Table) -> pa.Table:
    hosts = _host_of(batch.column("url"))
    t = pa.table(
        {
            "host": hosts,
            "n_docs": pa.array([1] * len(batch), type=pa.int64()),
            "total_chars": pc.cast(
                pc.utf8_length(batch.column("extracted_text")), pa.int64()
            ),
            "total_blocks_kept": batch.column("n_blocks_kept"),
            "parse_failures": pc.cast(
                pc.equal(batch.column("parse_status"), "failed"), pa.int64()
            ),
        }
    )
    return t.group_by("host").aggregate(
        [
            ("n_docs", "sum"),
            ("total_chars", "sum"),
            ("total_blocks_kept", "sum"),
            ("parse_failures", "sum"),
        ]
    ).rename_columns(
        ["host", "n_docs", "total_chars", "total_blocks_kept", "parse_failures"]
    )


def host_text_median(extracted: rd.Dataset, salts: int = 8) -> rd.Dataset:
    """Exact per-host median of extracted-text length via SALTED groupby.

    Median is not combinable, so the pre-agg trick of ``host_stats``
    doesn't apply — this is the op where host skew actually bites
    (one hot host = one giant reducer). The salt
    ``blake2b(url) % salts`` splits each host's rows across ``salts``
    stage-1 reducers; each packs its share into ONE sorted-array row,
    and stage 2 merges at most ``salts`` compact rows per host. The
    hot reducer now holds arrays, not rows — memory and time bounded
    by corpus/salts instead of max-host size.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def project(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        return pa.table(
            {
                "host": _host_of(batch.column("url")),
                "salt": pa.array(
                    [
                        int.from_bytes(
                            hashlib.blake2b(u.encode(), digest_size=2).digest(), "big"
                        )
                        % salts
                        for u in urls
                    ],
                    type=pa.int64(),
                ),
                "n_chars": pc.cast(
                    pc.utf8_length(batch.column("extracted_text")), pa.int64()
                ),
            }
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    projected = extracted.select_columns(["url", "extracted_text"]).map_batches(
        project, batch_format="pyarrow"
    )

    # Both stages are hash-PARTITIONED, never per-key dispatched:
    # Ray's groupby(...).map_groups pays a Python round-trip per
    # distinct (host, salt) — millions of groups at web scale (the
    # pathology measured at 37s/270k keys). Each partition instead
    # packs ALL its groups with one pandas groupby (C-speed hash agg).

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "host": pd.Series([], dtype="object"),
                    "values": pd.Series([], dtype="object"),
                }
            )
        packed = (
            g.groupby(["host", "salt"], sort=False)["n_chars"]
            .agg(list)
            .reset_index()
        )
        return pd.DataFrame({"host": packed["host"], "values": packed["n_chars"]})

    packed = partitioned_apply(projected, ["host", "salt"], pack_part)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "host": pd.Series([], dtype="object"),
                    "median_chars": pd.Series([], dtype="float64"),
                }
            )
        # explode to long form, then ONE vectorized groupby.median
        # over the whole partition (exact median, C path)
        long = g[["host", "values"]].explode("values")
        long["values"] = long["values"].astype("int64")
        out = long.groupby("host", sort=False)["values"].median().reset_index()
        return pd.DataFrame(
            {"host": out["host"], "median_chars": out["values"].astype("float64")}
        )

    return partitioned_apply(packed, ["host"], merge_part)


def host_stats(extracted: rd.Dataset) -> rd.Dataset:
    """extracted → (host, n_docs, total_chars, total_blocks_kept, parse_failures)."""
    partials = extracted.select_columns(
        ["url", "extracted_text", "n_blocks_kept", "parse_status"]
    ).map_batches(_partial, batch_format="pyarrow")
    return partials.groupby("host").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_chars", alias_name="total_chars"),
        Sum("total_blocks_kept", alias_name="total_blocks_kept"),
        Sum("parse_failures", alias_name="parse_failures"),
    )


def host_holdout(
    corpus: rd.Dataset,
    mod: int = 10,
    valid_residue: int = 0,
    seed: str = "holdout",
) -> rd.Dataset:
    """Leakage-free train/validation split at HOST granularity.

    Splitting a web corpus by row leaks near-duplicate pages (same
    site, same template) across the boundary; the standard fix is to
    assign every page of a host to one side. Membership is a pure
    hash of the host — ``md5_u64(f"{seed}:{host}") % mod ==
    valid_residue`` → 'valid', else 'train' — so the split is
    deterministic at any parallelism and any corpus subset (an
    incremental crawl lands new pages of a known host on the side the
    host already lives on).

    → one row per host: (host, split, n_docs, total_words). Host
    disjointness is structural (split is a function of host), and the
    driver's oracle recomputes the identical md5 rule in SQL.

    Reference analog: none — beyond-reference training-data op.

    Scale shape: per-batch (host, 1, n_words) residues → ONE hash
    aggregation over distinct hosts (bounded by the web's host count,
    ~1e8 at CC scale) → the split label is a vectorized hash over that
    residue. Document rows never shuffle.
    """
    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums
    from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column("text"), " ")
        return pa.table(
            {
                "host": _host_of(batch.column("url")),
                "total_words": pc.cast(
                    pc.list_value_length(words), pa.int64()
                ),
            }
        )

    residue = grouped_sums(
        corpus.select_columns(["url", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "host",
        ["total_words"],
        count_alias="n_docs",
    )

    def label(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        split = pa.array(
            [
                "valid"
                if md5_u64(f"{seed}:{h}") % mod == valid_residue
                else "train"
                for h in hosts
            ],
            type=pa.string(),
        )
        return batch.append_column("split", split)

    return residue.map_batches(label, batch_format="pyarrow").select_columns(
        ["host", "split", "n_docs", "total_words"]
    )
