#!/usr/bin/env python
"""Empirical resolve grid: (chunk_size × concurrency) wall time + consistency.

The analogue of the reference's ``scripts/ocr_chunk_grid.py`` (its
substitute for golden testing: % of values agreeing with the
chunk_size=1 baseline, ``CLAUDE.md:41-48``). With a deterministic
engine the interesting claim inverts: consistency must be EXACTLY
100% in every cell — chunking and parallelism are performance knobs
that cannot change results. This script demonstrates that while
measuring the cells.

Usage:
    python scripts/resolve_chunk_grid.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    import __ray_entry__  # noqa: F401  (registers modules by value)
    from vlm_ocr_doc_reader_ray.extract.document import extract_document
    from vlm_ocr_doc_reader_ray.extract.registry import chunked_resolve, scan_entities
    from vlm_ocr_doc_reader_ray.pipelines.extraction import read_corpus

    corpus = read_corpus(sf_dir)

    def run(chunk_size: int):
        def resolve_batch(batch: pa.Table) -> pa.Table:
            urls, eids, values, statuses = [], [], [], []
            for url, payload in zip(
                batch.column("url").to_pylist(), batch.column("html").to_pylist()
            ):
                res = extract_document(payload)
                if res.parse_status != "ok":
                    continue
                entries = chunked_resolve(
                    scan_entities(res), res.text, chunk_size=chunk_size
                )
                for e in entries:
                    urls.append(url)
                    eids.append(e.entity_id)
                    values.append(e.value)
                    statuses.append(e.status)
            return pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "entity_id": pa.array(eids, type=pa.string()),
                    "value": pa.array(values, type=pa.string()),
                    "status": pa.array(statuses, type=pa.string()),
                }
            )

        t0 = time.time()
        rows = corpus.map_batches(resolve_batch, batch_format="pyarrow").to_pandas()
        return rows.set_index(["url", "entity_id"]).sort_index(), time.time() - t0

    baseline, t_base = run(1)
    n_ok = (baseline["status"] == "ok").sum()
    print(f"chunk=1 baseline: {len(baseline)} entities, ok={n_ok}, {t_base:.1f}s")
    for chunk in (2, 5, 8):
        rows, dt = run(chunk)
        same = (rows["value"] == baseline["value"]).mean()
        print(
            f"chunk={chunk}: {dt:.1f}s  ok={(rows['status'] == 'ok').sum()}  "
            f"consistency={same:.1%}  (reference lost ~50% at chunk>=3; "
            f"deterministic engine must stay at 100%)"
        )
        assert same == 1.0, "determinism violation!"
    ray.shutdown()


if __name__ == "__main__":
    main()
