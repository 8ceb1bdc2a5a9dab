"""Checkpointed corpus run: partitioned extraction with exact resume.

The production entry point for the 100 TB job:

    run_checkpointed(input_files, out_root)

1. plans partitions (one per input file — at corpus scale input files
   are WARC-segment-sized parquet shards, so a partition ≈ one shard);
2. anti-joins against the manifest → only pending partitions run;
3. each partition is ONE self-contained Ray Data sub-pipeline
   (read shard → extract → write to a tmp dir → atomic rename →
   manifest row). Partitions stream through the cluster concurrently
   as independent datasets with bounded driver-side concurrency.

A crash mid-run loses at most the in-flight partitions; a re-run
skips every completed one byte-exactly (the pipeline is
deterministic). Changed input files invalidate their partition via
the input fingerprint.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import ray.data as rd

import vlm_ocr_doc_reader_ray as pkg
from vlm_ocr_doc_reader_ray.config import DEFAULT_CONFIG, EngineConfig
from vlm_ocr_doc_reader_ray.pipelines.extraction import extract
from vlm_ocr_doc_reader_ray.state.manifest import (
    PartitionManifest,
    atomic_partition_dir,
    completed_partitions,
    consolidate,
    partition_fingerprint,
    write_manifest,
)


def plan_partitions(input_files: Sequence[str]) -> dict[int, List[str]]:
    """Deterministic partition plan: sorted files, one per partition."""
    return {i: [f] for i, f in enumerate(sorted(input_files))}


def run_checkpointed(
    input_files: Sequence[str],
    out_root: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    fail_partition: Optional[int] = None,
) -> dict:
    """Run extraction over ``input_files`` with per-partition
    checkpoints. Returns run metrics (ran / skipped / rows).

    ``fail_partition`` injects a crash after that partition completes
    (test hook for the resume contract)."""
    plan = plan_partitions(input_files)
    fingerprints = {pid: partition_fingerprint(files) for pid, files in plan.items()}
    os.makedirs(out_root, exist_ok=True)
    done = completed_partitions(out_root, fingerprints) if resume else set()

    ran, skipped, total_rows = [], sorted(done), 0
    for pid in sorted(plan):
        if pid in done:
            continue
        files = plan[pid]
        ds = extract(
            rd.read_parquet(files),
            cfg=cfg,
            emit_spans=True,
            emit_registry=True,
        )
        with atomic_partition_dir(out_root, pid) as ctx:
            ds.write_parquet(os.path.join(ctx.tmp, "extracted"))
            # derived tables from the already-written extraction (read
            # back — never re-extract). ONE disk read: the read-back is
            # materialized into the object store (spillable, partition-
            # sized) and all three derived outputs — registry,
            # page_states, metrics — project from those shared blocks
            # instead of re-reading the partition from disk per output.
            from vlm_ocr_doc_reader_ray.pipelines.extraction import (
                page_states_table,
                registry_table,
            )

            written = rd.read_parquet(os.path.join(ctx.tmp, "extracted")).materialize()
            registry_table(written).write_parquet(os.path.join(ctx.tmp, "registry"))
            page_states_table(written).write_parquet(
                os.path.join(ctx.tmp, "page_states")
            )
            part = written.select_columns(
                ["n_blocks_kept", "n_blocks_dropped", "parse_status"]
            )
            import pyarrow as pa

            def metrics(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table(
                    {
                        "rows": pa.array([len(batch)], type=pa.int64()),
                        "kept": pa.array(
                            [pc.sum(batch.column("n_blocks_kept")).as_py() or 0],
                            type=pa.int64(),
                        ),
                        "dropped": pa.array(
                            [pc.sum(batch.column("n_blocks_dropped")).as_py() or 0],
                            type=pa.int64(),
                        ),
                        "failures": pa.array(
                            [
                                pc.sum(
                                    pc.cast(
                                        pc.equal(batch.column("parse_status"), "failed"),
                                        pa.int64(),
                                    )
                                ).as_py()
                                or 0
                            ],
                            type=pa.int64(),
                        ),
                    }
                )

            mdf = part.map_batches(metrics, batch_format="pyarrow").to_pandas()
            final_path = ctx.final
        write_manifest(
            out_root,
            PartitionManifest(
                partition_id=pid,
                input_fingerprint=fingerprints[pid],
                row_count=int(mdf["rows"].sum()),
                n_blocks_kept=int(mdf["kept"].sum()),
                n_blocks_dropped=int(mdf["dropped"].sum()),
                parse_failures=int(mdf["failures"].sum()),
                output_path=final_path,
                engine_version=pkg.__version__,
            ),
        )
        ran.append(pid)
        total_rows += int(mdf["rows"].sum())
        if fail_partition is not None and pid == fail_partition:
            raise RuntimeError(f"injected crash after partition {pid}")

    consolidate(out_root)
    return {"ran": ran, "skipped": skipped, "rows_written": total_rows}
