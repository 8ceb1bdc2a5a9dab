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
    st = pc.extract_regex(urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
                          r"^https?://(?P<host>[^/]+)")
    return st.field("host") if hasattr(st, "field") else pc.struct_field(st, "host")


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

    projected = extracted.select_columns(["url", "extracted_text"]).map_batches(
        project, batch_format="pyarrow"
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": [g["host"].iloc[0]],
                "values": [np.sort(g["n_chars"].to_numpy()).tolist()],
            }
        )

    packed = projected.groupby(["host", "salt"]).map_groups(pack, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(np.concatenate([np.asarray(v) for v in g["values"]]))
        return pd.DataFrame(
            {"host": [g["host"].iloc[0]], "median_chars": [float(np.median(vals))]}
        )

    return packed.groupby("host").map_groups(merge, batch_format="pandas")


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
