"""A/B: sequential vs bounded-concurrent checkpointed runner.

VERDICT r3 #4 evidence: with many SMALL input files (the common real
corpus layout) the sequential partition loop idles the cluster at
every partition boundary; the bounded pool (default 4 in-flight
partitions) must show a clear win. Usage:

    python scripts/bench_checkpoint_concurrency.py [n_files] [cpus]

Prints one JSON line {files, cpus, seq_s, con_s, speedup}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32")
    )
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from vlm_ocr_doc_reader_ray.runtime import register_for_workers

    register_for_workers()

    import pyarrow.parquet as pq

    from vlm_ocr_doc_reader_ray.pipelines.checkpoint import run_checkpointed
    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    # small files: slice the cached sf0.001 corpus into n_files shards
    src = corpus_parquet("/root/testdata/sf0.001", reps=4)
    table = pq.read_table(src)
    work = tempfile.mkdtemp(prefix="ckpt_ab_", dir="/dev/shm")
    files = []
    rows = len(table)
    per = max(1, rows // n_files)
    for i in range(n_files):
        part = table.slice(i * per, per if i < n_files - 1 else rows - i * per)
        p = os.path.join(work, f"in-{i:04d}.parquet")
        pq.write_table(part, p)
        files.append(p)

    # warmup (worker spawn / imports)
    run_checkpointed(files[:2], os.path.join(work, "warm"))

    t0 = time.time()
    run_checkpointed(files, os.path.join(work, "seq"), max_concurrent=1)
    seq_s = time.time() - t0

    t0 = time.time()
    run_checkpointed(files, os.path.join(work, "con"))
    con_s = time.time() - t0

    # packed plan: amortize the per-partition fixed cost over ~4
    # files per partition, still 4 in flight
    total = sum(os.stat(f).st_size for f in files)
    t0 = time.time()
    r = run_checkpointed(
        files, os.path.join(work, "pack"),
        target_partition_bytes=max(1, total // (n_files // 4)),
    )
    pack_s = time.time() - t0

    print(json.dumps({
        "files": n_files, "cpus": cpus, "seq_s": round(seq_s, 2),
        "con_s": round(con_s, 2), "pack_s": round(pack_s, 2),
        "pack_partitions": len(r["ran"]),
        "speedup_con": round(seq_s / con_s, 2),
        "speedup_pack": round(seq_s / pack_s, 2),
    }))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
