"""Balanced training-shard writer.

The last mile of a training-data pipeline: write the corpus as N
equal-sized parquet shards in a deterministic shuffled order, so a
trainer can stream shard files round-robin and every re-run of the
writer produces byte-identical shards (resumable: finished shards are
skipped).

Scale shape: the shard id is ``global rank // docs_per_shard`` where
the rank comes from the distributed md5-order prefix sum
(:func:`~vlm_ocr_doc_reader_ray.stages.relational.global_sorted_rank`
— one residue pass + one row shuffle, no global sort). The rank is
computed over a KEY-ONLY projection — the prefix sum pins only
``(key, md5, bucket)`` residues in the object store, never the
document texts — and re-attached to the full rows with one
co-partitioned hash join. Rows are then hash-partitioned BY SHARD, so
each shard lands wholly inside one task which sorts it by rank and
writes one file — writes fan out across the cluster, one file per
shard, never one giant file, and the full corpus is never
materialized anywhere. The returned manifest is one row per shard
(bounded by shard count, not data).

Trade-off made explicit: the input lineage executes TWICE (once for
the key projection that feeds the rank, once as the join's row side).
That is the right trade at scale — re-reading a checkpoint is disk
bandwidth, pinning the corpus was cluster memory — and the API now
ENFORCES its own precondition instead of relying on a docstring: when
the input's logical plan is anything beyond a bare read (+ column
projections), ``spill="auto"`` checkpoints it to parquet first via
the shared :func:`~vlm_ocr_doc_reader_ray.state.pin.pin` primitive,
so an expensive upstream (extraction, curation) executes exactly once
and both legs re-read the checkpoint. ``spill="never"`` restores the
caller-managed contract; ``spill="always"`` forces the checkpoint
even for bare reads (useful when the source is remote/slow).

Filesystem contract: paths are resolved through ``pyarrow.fs`` inside
each writer task, so ``out_dir`` may be a local directory (single
node or a shared filesystem — on a multi-node cluster it MUST be
shared storage, since the skip-finished resume check consults the
same path) or any pyarrow-supported URI. The tmp-write + move publish
is atomic on local/NFS filesystems; on object stores move is
copy+delete, and idempotence comes from deterministic content + the
exists-check instead.
"""

from __future__ import annotations

import os
import posixpath

import pandas as pd
import ray.data as rd

# manifest schema — ONE definition shared by the per-partition writer
# and the empty-input fallback so the two can't drift
_MANIFEST_COLS = {"shard": "int64", "rows": "int64",
                  "path": "object", "skipped": "bool"}


def _resolve_fs(path: str):
    """``pyarrow.fs`` resolution: URI → (fs, path); plain local path →
    (LocalFileSystem, abspath)."""
    import pyarrow as pa
    from pyarrow import fs as pafs

    try:
        return pafs.FileSystem.from_uri(path)
    except (ValueError, pa.ArrowInvalid):
        return pafs.LocalFileSystem(), os.path.abspath(path)


def _is_cheap_lineage(ds: rd.Dataset) -> bool:
    """True when re-executing ``ds``'s lineage costs ~one read: the
    logical plan contains only ``Read`` / ``InputData`` (already
    materialized or from-items) / ``Project`` (column selection)
    nodes. Anything with compute or a shuffle (``MapBatches``,
    ``Filter``, ``Aggregate``, ``Sort``, ``Join``, ``Union``, …) makes
    the double execution expensive. Conservative by construction: an
    unrecognizable plan reports *not* cheap, so the caller spills."""
    try:
        stack = [ds._logical_plan.dag]
    except Exception:
        return False
    cheap = {"Read", "InputData", "Project"}
    while stack:
        node = stack.pop()
        if type(node).__name__ not in cheap:
            return False
        stack.extend(node.input_dependencies)
    return True


def write_training_shards(
    ds: rd.Dataset,
    key_col: str,
    out_dir: str,
    docs_per_shard: int,
    seed: str = "shuffle",
    spill: str = "auto",
) -> pd.DataFrame:
    """Write ``ds`` as balanced parquet shards in deterministic
    md5-of-key order; returns a (shard, rows, path, skipped) manifest.

    Every shard holds exactly ``docs_per_shard`` rows (the last may be
    short), ordered by the global shuffle rank. A shard file that
    already exists is left untouched and reported ``skipped`` — the
    idempotent-resume contract: a killed run re-invoked with the same
    inputs finishes the remaining shards and the directory is
    indistinguishable from a single clean run (files are written to a
    ``.tmp`` name and moved into place, so a crash mid-write never
    leaves a truncated shard behind). Assumes ``key_col`` is unique
    per row (corpus primary key)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        auto_num_parts,
        partitioned_apply,
    )
    from vlm_ocr_doc_reader_ray.stages.relational import (
        global_sorted_rank,
        partitioned_hash_join,
    )

    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")
    if spill not in ("auto", "always", "never"):
        raise ValueError(f"spill must be auto|always|never, got {spill!r}")
    if spill == "always" or (spill == "auto" and not _is_cheap_lineage(ds)):
        from vlm_ocr_doc_reader_ray.state.pin import pin

        # the writer reads its input twice (rank leg + join leg);
        # checkpoint any non-trivial lineage so it executes once
        ds = pin(ds, persist="disk", label="shards_input")
    root_fs, root_path = _resolve_fs(out_dir)
    root_fs.create_dir(root_path, recursive=True)

    # rank the KEYS, not the rows: the prefix sum's internal pin is
    # then bounded by |keys| × ~50 bytes, not the corpus
    ranked = global_sorted_rank(
        ds.select_columns([key_col]), key_col, seed=seed
    )

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__shard"] = (
            batch["rank"].to_numpy(dtype="int64") // docs_per_shard
        )
        return batch

    shard_of_key = ranked.map_batches(add_shard, batch_format="pandas")

    # empty input: a fully-empty Ray dataset loses its schema, which
    # the join below needs — short-circuit to the empty manifest
    # (schema() is computed by the join anyway, so this costs nothing
    # extra on the non-empty path)
    if shard_of_key.schema() is None or ds.schema() is None:
        return pd.DataFrame(
            {c: pd.Series([], dtype=dt) for c, dt in _MANIFEST_COLS.items()}
        )

    # one co-partitioned hash join re-attaches (rank, __shard) to the
    # full rows — the only time the texts shuffle
    sharded = partitioned_hash_join(
        ds, shard_of_key, key_col, key_col, num_buckets=auto_num_parts(ds)
    )

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        fs, base = _resolve_fs(out_dir)
        rows = []
        for shard, sg in g.groupby("__shard", sort=True):
            shard = int(shard)
            path = posixpath.join(base, f"shard-{shard:05d}.parquet")
            if fs.get_file_info(path).type != pafs.FileType.NotFound:
                rows.append((shard, len(sg), path, True))
                continue
            sg = sg.sort_values("rank", ignore_index=True).drop(
                columns="__shard"
            )
            tmp = path + ".tmp"
            pq.write_table(
                pa.Table.from_pandas(sg, preserve_index=False), tmp,
                filesystem=fs,
            )
            fs.move(tmp, path)
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
