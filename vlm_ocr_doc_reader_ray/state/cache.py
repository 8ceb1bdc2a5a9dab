"""Engine-wide cache-root resolver for persisted artifacts.

Every build-once artifact the engine persists outside a pipeline run —
the synthesized corpus cache, the hash/minhash/term/IVF index
directories — resolves its location through :func:`cache_root` so the
storage scope is a single deployment decision instead of a per-site
``/tmp`` literal:

- single node (tests, bench, this sandbox): the default ``/tmp`` is
  correct — every worker shares the local filesystem.
- multi-node cluster: set ``$GRAFT_CACHE_ROOT`` to SHARED storage (an
  NFS mount or fuse-mounted object store). The artifacts are plain
  parquet directories read via ``ray.data.read_parquet`` — which
  routes through ``pyarrow.fs`` — so the read side works off-node
  unchanged; the build side's atomic-publish (`os.rename`) requires a
  POSIX-rename filesystem, which NFS provides. On a rename-less object
  store, publish through a fuse layer or pre-build the indexes.

Resolved lazily (env read per call, not at import) so a test or
driver can redirect the cache root at runtime.
"""

from __future__ import annotations

import os

__all__ = ["cache_root", "cache_dir"]


def cache_root() -> str:
    """``$GRAFT_CACHE_ROOT`` if set, else ``/tmp``."""
    return os.environ.get("GRAFT_CACHE_ROOT", "/tmp")


def cache_dir(*parts: str) -> str:
    """Join ``parts`` under :func:`cache_root` (no directory creation
    — publishers create atomically, readers expect existence)."""
    return os.path.join(cache_root(), *parts)
