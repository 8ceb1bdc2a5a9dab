"""Shared spill-capable pipeline breaker.

Several operators need a *pin*: a point where the stream's blocks are
persisted so that (a) multiple downstream consumers don't re-execute
the upstream lineage, or (b) a sort-shuffle's boundary sampling
doesn't re-run an expensive explode (the repo's standing sort-shuffle
finding, see ``stages/scrub.py``).

``materialize()`` is the in-memory form: it pins the blocks in Ray's
object store. That is right for *bounded* residues (one row per host,
per vocab term, per register) but wrong for residues that scale with
the corpus — at 100-TB scale a token-level gram table is larger than
the corpus itself and would thrash the store even with spilling.

:func:`pin` is the one shared primitive: ``persist="disk"`` routes the
residue through a parquet checkpoint (bounded by disk bandwidth, like
``pipelines/checkpoint.py``), ``persist="memory"`` keeps the
``materialize()`` behavior, and ``persist="auto"`` resolves
``$GRAFT_PIN_PERSIST`` then the call site's ``default``. Call sites
pick their ``default`` by the residue's bound: corpus-scale residues
default to ``disk``; small host/vocab residues may default to
``memory``.

The spill directory is ``spill_dir`` / ``$GRAFT_SPILL_DIR`` / system
tmp. Spill files outlive the call because the returned Dataset reads
them lazily; they are named ``{label}_spill_*`` so a janitor (or the
OS tmp reaper) can reclaim them. On a multi-node cluster point
``$GRAFT_SPILL_DIR`` at a shared filesystem or object store URI —
``write_parquet``/``read_parquet`` route through ``pyarrow.fs`` and
accept any filesystem URI, so the pin works unchanged off-node.
"""

from __future__ import annotations

import os
import tempfile

import ray.data as rd

__all__ = ["pin"]


def pin(
    ds: rd.Dataset,
    persist: str = "auto",
    spill_dir: str | None = None,
    default: str = "disk",
    label: str = "pin",
) -> rd.Dataset:
    """Persist ``ds`` once; return a Dataset that re-reads the result.

    ``persist``: ``"memory"`` → ``materialize()`` (object-store pin);
    ``"disk"`` → parquet spill + lazy re-read; ``"auto"`` →
    ``$GRAFT_PIN_PERSIST`` if set, else ``default``.

    If the stream turns out to be empty, the disk path falls back to
    ``materialize()`` so the caller still gets a schema-typed empty
    Dataset (an empty stream's lineage re-run is cheap by definition;
    parquet leaves no files behind for an empty write).
    """
    if persist == "auto":
        persist = os.environ.get("GRAFT_PIN_PERSIST", default)
    if persist == "memory":
        return ds.materialize()
    if persist != "disk":
        raise ValueError(f"persist must be auto|memory|disk, got {persist!r}")
    root = spill_dir or os.environ.get("GRAFT_SPILL_DIR") or tempfile.gettempdir()
    os.makedirs(root, exist_ok=True)
    path = tempfile.mkdtemp(prefix=f"{label}_spill_", dir=root)

    # Strip schema metadata before writing: blocks produced by pandas
    # UDFs carry a `pandas` schema-metadata blob, and parquet persists
    # it. Re-read blocks then mix metadata'd and clean schemas, which
    # breaks Ray's native join (acero resolves FieldRef by the merged
    # schema and reports "No match or multiple matches") and its block
    # schema dedup ("unhashable type: dict"). Metadata carries no
    # data, so dropping it is lossless.
    def _strip(t):
        return t.replace_schema_metadata(None)

    ds.map_batches(_strip, batch_format="pyarrow").write_parquet(path)
    if not any(name.endswith(".parquet") for name in os.listdir(path)):
        return ds.materialize()
    return rd.read_parquet(path)
