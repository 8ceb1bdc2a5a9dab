"""Balanced training-shard writer.

The last mile of a training-data pipeline: write the corpus as N
equal-sized parquet shards in a deterministic shuffled order, so a
trainer can stream shard files round-robin and every re-run of the
writer produces byte-identical shards (resumable: finished shards are
skipped).

Scale shape: the shard id is ``global rank // docs_per_shard`` where
the rank comes from the distributed md5-order prefix sum
(:func:`~vlm_ocr_doc_reader_ray.stages.relational.global_sorted_rank`
— one residue pass + one row shuffle, no global sort). Rows are then
hash-partitioned BY SHARD, so each shard lands wholly inside one task
which sorts it by rank and writes one file — writes fan out across
the cluster, one file per shard, never one giant file. The returned
manifest is one row per shard (bounded by shard count, not data).
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

# manifest schema — ONE definition shared by the per-partition writer
# and the empty-input fallback so the two can't drift
_MANIFEST_COLS = {"shard": "int64", "rows": "int64",
                  "path": "object", "skipped": "bool"}


def write_training_shards(
    ds: rd.Dataset,
    key_col: str,
    out_dir: str,
    docs_per_shard: int,
    seed: str = "shuffle",
) -> pd.DataFrame:
    """Write ``ds`` as balanced parquet shards in deterministic
    md5-of-key order; returns a (shard, rows, path, skipped) manifest.

    Every shard holds exactly ``docs_per_shard`` rows (the last may be
    short), ordered by the global shuffle rank. A shard file that
    already exists is left untouched and reported ``skipped`` — the
    idempotent-resume contract: a killed run re-invoked with the same
    inputs finishes the remaining shards and the directory is
    indistinguishable from a single clean run (files are written to a
    ``.tmp`` name and renamed, so a crash mid-write never leaves a
    truncated shard behind)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.relational import global_sorted_rank

    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")
    os.makedirs(out_dir, exist_ok=True)

    ranked = global_sorted_rank(ds, key_col, seed=seed)

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__shard"] = (
            batch["rank"].to_numpy(dtype="int64") // docs_per_shard
        )
        return batch

    sharded = ranked.map_batches(add_shard, batch_format="pandas")

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = []
        for shard, sg in g.groupby("__shard", sort=True):
            shard = int(shard)
            path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
            if os.path.exists(path):
                rows.append((shard, len(sg), path, True))
                continue
            sg = sg.sort_values("rank", ignore_index=True).drop(
                columns="__shard"
            )
            tmp = path + ".tmp"
            pq.write_table(pa.Table.from_pandas(sg, preserve_index=False), tmp)
            os.replace(tmp, path)
            rows.append((shard, len(sg), path, False))
        return pd.DataFrame(
            rows, columns=list(_MANIFEST_COLS)
        ).astype({"shard": "int64", "rows": "int64"})

    manifest = partitioned_apply(sharded, ["__shard"], write_part).to_pandas()
    if manifest.empty:  # empty input: schema-stable empty manifest
        return pd.DataFrame(
            {c: pd.Series([], dtype=dt) for c, dt in _MANIFEST_COLS.items()}
        )
    return manifest.sort_values("shard", ignore_index=True)
