"""Session-scoped Ray fixture: one local cluster for the whole run."""

from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from vlm_ocr_doc_reader_ray.runtime import (
        silence_empty_block_schema_warnings,
        stabilize_fsspec_http,
    )

    stabilize_fsspec_http()
    silence_empty_block_schema_warnings()
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med() -> str:
    return SF_MED


@pytest.fixture(scope="session")
def small_documents():
    """documents rows of sf0.001 as a list of (doc_id, text, lang, source)."""
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SF_SMALL}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
