"""Worker-shipping support for the uninstalled package.

The repo is used in place (no pip install), so Ray workers spawned
from a driver whose cwd/PYTHONPATH doesn't include the repo cannot
import the package by reference. Registering every package module
with cloudpickle's pickle-by-value makes task/actor payloads
self-contained. Called by ``__ray_entry__`` and the CLI at startup;
idempotent and safe to call before or after ``ray.init``.
"""

from __future__ import annotations

import sys


def stabilize_fsspec_http() -> None:
    """Make Ray Data path resolution thread-safe in aiohttp-less envs.

    Ray's ``path_util._is_http_filesystem`` re-attempts
    ``from fsspec.implementations.http import HTTPFileSystem`` on
    EVERY read/write path resolution. Without aiohttp that import
    fails at module level, and a failing import leaves a
    partially-initialized module transiently visible to OTHER threads
    — concurrent driver threads each running their own Ray pipeline
    (``run_checkpointed``'s bounded partition pool) then
    nondeterministically die with
    ``ImportError: cannot import name 'HTTPFileSystem'`` (reproduced
    with 8 threads × read_parquet, 6/24 failures). Registering a
    minimal stub ONCE makes every later import a stable sys.modules
    cache hit. The stub class is only ever instantiated for
    ``http(s)://`` inputs, which this engine never produces — and it
    raises the original error if anything truly uses it."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # aiohttp present: the real module works, nothing to do
    except ImportError:
        pass
    import types

    try:
        import fsspec
    except ImportError:  # no fsspec at all → Ray's except path handles it
        return

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem(fsspec.AbstractFileSystem):  # pragma: no cover
        protocol = ("http", "https")

        def __init__(self, *a, **k):
            raise ImportError(
                "aiohttp is not installed — HTTP filesystem unavailable"
            )

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def silence_empty_block_schema_warnings() -> None:
    """Drop the executor's schema-mismatch warning ONLY for empty
    blocks.

    Ray's sort-based shuffle (behind every ``groupby``/``map_groups``)
    emits schema-LESS empty blocks for key ranges that hold no rows;
    the streaming executor then logs 'Operator produced a RefBundle
    with a different schema ... new schema: names=[]' on every such
    boundary — pure noise (the engine's own empty blocks are always
    schema-stable; see e.g. partitioned_hash_join.join_bucket).
    Genuine schema mismatches (non-empty new schema) still log."""
    import logging

    class _DropEmptySchemaMismatch(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            if "produced a RefBundle with a different schema" not in msg:
                return True
            if (
                "new schema: PandasBlockSchema(names=[], types=[])" in msg
                or "new schema: . This may lead" in msg
            ):
                return False
            # partitioned_hash_join's pad-union: the two sides carry
            # identical column NAMES but the padded side holds None →
            # object dtype where the real side is int64/bool. Expected
            # by construction and normalized by _restore_dtypes inside
            # the bucket join — '__side' is that operator's private
            # marker column, so the match cannot hit user data.
            return "'__side'" not in msg

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySchemaMismatch())


def register_for_workers() -> None:
    stabilize_fsspec_http()
    silence_empty_block_schema_warnings()
    # import the module graph so every submodule is in sys.modules
    import vlm_ocr_doc_reader_ray.cli  # noqa: F401
    import vlm_ocr_doc_reader_ray.pipelines.checkpoint  # noqa: F401
    import vlm_ocr_doc_reader_ray.pipelines.extraction  # noqa: F401
    import vlm_ocr_doc_reader_ray.pipelines.curation  # noqa: F401
    import vlm_ocr_doc_reader_ray.pipelines.shards  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.aggregates  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.bpe  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.dedup  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.host_stats  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.linkgraph  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.multimodal  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.registry_stage  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.relational  # noqa: F401
    import vlm_ocr_doc_reader_ray.sources.jsonl  # noqa: F401
    import vlm_ocr_doc_reader_ray.sources.warc  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.scrub  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.sketch  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.similarity  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.text_analysis  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.urltools  # noqa: F401

    try:
        from ray import cloudpickle

        for name, mod in list(sys.modules.items()):
            if name.startswith("vlm_ocr_doc_reader_ray") and mod is not None:
                cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass  # by-reference fallback (works when cwd is the repo)
