"""Per-partition manifest: checkpoints with lineage + metrics.

Replaces the reference's content-addressed workspace + write-through
``state.json`` (``core/state.py:283-327,747-779``; resume contract
ADR-001 ``decision_001_resolution_levels.md:46-48,147-181``) with the
batch-pipeline equivalent:

- output is partitioned: one directory per input partition, written
  atomically (tmp dir + rename) — a partition either fully exists or
  not at all (exact-once output);
- each completed partition appends one manifest row: partition id,
  input fingerprint, row count, extraction metrics (kept / dropped /
  parse failures), output path, engine version;
- resume = anti-join planned partitions against valid manifest rows
  (the reference's ``pending_entities`` idea, ``core/state.py:824-840``,
  lifted from entity granularity to partition granularity — valid
  because partitions are deterministic functions of their inputs, so
  re-running a finished partition is idempotent and skipping it is
  exact).

Manifest rows live as one JSON file per partition (side-effect-free
concurrent writers, no shared mutable state), plus a consolidated
``manifest.parquet`` written by ``consolidate()`` for fast reads.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"


@dataclass(frozen=True)
class PartitionManifest:
    partition_id: int
    input_fingerprint: str  # hash of the input file list / row range
    row_count: int
    n_blocks_kept: int
    n_blocks_dropped: int
    parse_failures: int
    output_path: str
    engine_version: str


def partition_fingerprint(input_files: List[str]) -> str:
    """Identity of a partition's inputs: names + sizes + mtimes.

    The analogue of the reference's ``compute_content_hash``
    (``core/state.py:225-241``) without re-reading bytes — metadata
    identity is enough because inputs are immutable Parquet."""
    h = hashlib.sha256()
    for f in sorted(input_files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{int(st.st_mtime)}|".encode())
    return h.hexdigest()[:16]


def _manifest_path(out_root: str, partition_id: int) -> str:
    return os.path.join(out_root, MANIFEST_DIR, f"part-{partition_id:05d}.json")


def write_manifest(out_root: str, m: PartitionManifest) -> None:
    os.makedirs(os.path.join(out_root, MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(out_root, m.partition_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f)
    os.replace(tmp, _manifest_path(out_root, m.partition_id))


def read_manifests(out_root: str) -> dict[int, PartitionManifest]:
    mdir = os.path.join(out_root, MANIFEST_DIR)
    out: dict[int, PartitionManifest] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                d = json.load(f)
            m = PartitionManifest(**d)
        except (json.JSONDecodeError, TypeError):
            continue  # torn/corrupt manifest row → partition not done
        if os.path.isdir(m.output_path):
            out[m.partition_id] = m
    return out


def completed_partitions(out_root: str, fingerprints: dict[int, str]) -> set[int]:
    """Partitions whose manifest exists AND whose input fingerprint
    still matches (a changed input invalidates the checkpoint — the
    reference's 'changed file → fresh state' rule)."""
    done = set()
    for pid, m in read_manifests(out_root).items():
        if fingerprints.get(pid) == m.input_fingerprint:
            done.add(pid)
    return done


def atomic_partition_dir(out_root: str, partition_id: int):
    """Context for writing one partition atomically."""

    class _Ctx:
        def __init__(self) -> None:
            self.final = os.path.join(out_root, f"part-{partition_id:05d}")
            self.tmp = self.final + ".tmp"

        def __enter__(self):
            shutil.rmtree(self.tmp, ignore_errors=True)
            os.makedirs(self.tmp, exist_ok=True)
            return self

        def __exit__(self, exc_type, exc, tb):
            if exc_type is None:
                shutil.rmtree(self.final, ignore_errors=True)
                os.replace(self.tmp, self.final)
            else:
                shutil.rmtree(self.tmp, ignore_errors=True)
            return False

    return _Ctx()


def consolidate(out_root: str) -> Optional[str]:
    """All manifest rows → ``manifest.parquet`` (lineage table)."""
    ms = read_manifests(out_root)
    if not ms:
        return None
    rows = [asdict(m) for m in sorted(ms.values(), key=lambda m: m.partition_id)]
    table = pa.Table.from_pylist(rows)
    path = os.path.join(out_root, "manifest.parquet")
    pq.write_table(table, path)
    return path
