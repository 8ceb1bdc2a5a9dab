"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` maps operator names → callables over an ``sf_dir``;
``oracle_sql()`` gives the DuckDB mirror for each (the corpus is a
pure function of the ``documents`` table, so golden outputs are
SQL-expressible — see ``vlm_ocr_doc_reader_ray/corpus/sqlmirror.py``).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` happens here or below.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _register_by_value() -> None:
    """Ship the package to Ray workers by value.

    The package is not pip-installed, so workers spawned from a driver
    whose cwd/PYTHONPATH doesn't include the repo would fail to import
    it by reference. Registering the modules with cloudpickle makes the
    task/actor payload self-contained.
    """
    import vlm_ocr_doc_reader_ray  # noqa: F401
    import vlm_ocr_doc_reader_ray.pipelines.extraction  # noqa: F401
    import vlm_ocr_doc_reader_ray.stages.host_stats  # noqa: F401

    try:
        from ray import cloudpickle

        for name, mod in list(sys.modules.items()):
            if name.startswith("vlm_ocr_doc_reader_ray") and mod is not None:
                cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass  # fall back to by-reference (works when cwd is the repo)


_register_by_value()

EXTRACT_COLUMNS = [
    "url",
    "lang",
    "extracted_text",
    "text_sha256",
    "n_blocks_kept",
    "parse_status",
    "page_count",
]


def _extracted(sf_dir: str, emit_registry: bool = False):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import extract, read_corpus

    corpus = read_corpus(sf_dir)
    return extract(corpus, emit_spans=False, emit_registry=emit_registry)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _extracted("/root/testdata/sf0.001").select_columns(EXTRACT_COLUMNS)


def _q_extract_text(sf_dir: str):
    return _extracted(sf_dir).select_columns(EXTRACT_COLUMNS)


def _q_extract_headers(sf_dir: str):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import headers_table

    return headers_table(_extracted(sf_dir))


def _q_registry(sf_dir: str):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import registry_table

    return registry_table(_extracted(sf_dir, emit_registry=True)).select_columns(
        ["url", "page_num", "kind", "value", "resolution", "verified", "confidence", "status"]
    )


def _q_page_states(sf_dir: str):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import page_states_table

    return page_states_table(_extracted(sf_dir))


def _q_host_stats(sf_dir: str):
    from vlm_ocr_doc_reader_ray.stages.host_stats import host_stats

    return host_stats(_extracted(sf_dir))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": _q_extract_text,
        "extract_headers": _q_extract_headers,
        "registry_entities": _q_registry,
        "page_states": _q_page_states,
        "host_doc_stats": _q_host_stats,
    }


def oracle_sql() -> dict[str, str]:
    from vlm_ocr_doc_reader_ray.corpus import sqlmirror as sm

    return {
        "extract_text": sm.EXTRACT_TEXT_SQL,
        "extract_headers": sm.EXTRACT_HEADERS_SQL,
        "registry_entities": sm.REGISTRY_SQL,
        "page_states": sm.PAGE_STATES_SQL,
        "host_doc_stats": sm.HOST_STATS_SQL,
    }
