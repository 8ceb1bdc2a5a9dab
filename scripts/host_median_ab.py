#!/usr/bin/env python
"""A/B: host_text_median via hash-partitioned apply vs raw per-key
map_groups, at a high distinct-host count.

Ray's ``groupby(keys).map_groups`` pays a Python round-trip per
distinct group; with 100k+ hosts × 8 salts that is ~1M dispatches in
stage 1 alone. The rewritten operator hash-partitions by (host, salt)
/ host and packs/merges each partition with ONE vectorized pandas
groupby, so wall time stays flat in the number of hosts.

Usage:
    python scripts/host_median_ab.py [n_rows] [n_hosts]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def synth(n_rows: int, n_hosts: int):
    """(url, extracted_text) rows over n_hosts distinct hosts."""
    import numpy as np
    import pandas as pd

    rng = np.arange(n_rows)
    host_ids = rng % n_hosts
    return pd.DataFrame(
        {
            "url": [
                f"https://h{h}.example.com/p{i}" for i, h in zip(rng, host_ids)
            ],
            "extracted_text": ["x" * int(10 + (i * 37) % 900) for i in rng],
        }
    )


def per_key_baseline(ds, salts: int = 8):
    """The pre-rewrite shape: groupby(host, salt).map_groups then
    groupby(host).map_groups — kept here only as the A/B baseline."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.host_stats import _host_of

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

    projected = ds.select_columns(["url", "extracted_text"]).map_batches(
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


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.runtime import register_for_workers
    from vlm_ocr_doc_reader_ray.stages.host_stats import host_text_median

    register_for_workers()

    df = synth(n_rows, n_hosts)
    ds = rd.from_pandas(df).repartition(32).materialize()

    t0 = time.perf_counter()
    new = host_text_median(ds).to_pandas().sort_values("host", ignore_index=True)
    t_new = time.perf_counter() - t0
    print(f"partitioned (new): {t_new:.2f}s  rows={len(new)}")

    t0 = time.perf_counter()
    old = per_key_baseline(ds).to_pandas().sort_values("host", ignore_index=True)
    t_old = time.perf_counter() - t0
    print(f"per-key map_groups (old): {t_old:.2f}s  rows={len(old)}")

    assert new.equals(old), "A/B results diverge"
    print(f"identical results; speedup {t_old / t_new:.1f}x at {n_hosts} hosts")
    ray.shutdown()


if __name__ == "__main__":
    main()
