"""Distributed == oracle, byte-for-byte, at any partitioning.

The north-star invariant: every url's extracted text (and sha256) from
the Ray pipeline equals the single-process oracle's, regardless of
block layout, batch size, or task/actor strategy.
"""

import hashlib

import pytest

from vlm_ocr_doc_reader_ray.corpus.generator import (
    CORRUPT_PAYLOAD,
    build_html,
    build_spdf,
    golden,
    is_corrupt_doc,
    is_pdf_doc,
    url_of,
)


@pytest.fixture(scope="module")
def oracle_hashes(small_documents):
    out = {}
    for doc_id, text, lang, source in small_documents:
        g = golden(doc_id, text, lang, source)
        out[url_of(doc_id, lang, source)] = hashlib.sha256(
            g.extracted_text.encode()
        ).hexdigest()
    return out


def _run(sf_dir, **kw):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import extract, read_corpus

    ds = extract(read_corpus(sf_dir), emit_spans=False, emit_registry=False, **kw)
    return {
        r["url"]: r["text_sha256"]
        for r in ds.select_columns(["url", "text_sha256"]).take_all()
    }


def test_pipeline_matches_oracle(ray_session, sf_small, oracle_hashes):
    got = _run(sf_small)
    assert got == oracle_hashes


def test_identity_invariant_under_partitioning(ray_session, sf_small, oracle_hashes):
    """Different block counts / batch sizes / actor pools → same bytes."""
    from vlm_ocr_doc_reader_ray.config import EngineConfig
    from vlm_ocr_doc_reader_ray.pipelines.extraction import extract, synth_corpus

    for num_blocks, batch_size, concurrency in [(1, 17, None), (7, 64, None), (3, 500, 2)]:
        corpus = synth_corpus(sf_small, override_num_blocks=num_blocks)
        cfg = EngineConfig(extract_batch_size=batch_size)
        ds = extract(
            corpus, cfg=cfg, emit_spans=False, emit_registry=False, concurrency=concurrency
        )
        got = {
            r["url"]: r["text_sha256"]
            for r in ds.select_columns(["url", "text_sha256"]).take_all()
        }
        assert got == oracle_hashes, (num_blocks, batch_size, concurrency)


def test_registry_explode_counts(ray_session, sf_small, small_documents):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import (
        extract,
        read_corpus,
        registry_table,
    )

    reg = registry_table(extract(read_corpus(sf_small), emit_spans=False))
    n_ok_docs = sum(1 for d, *_ in small_documents if not is_corrupt_doc(d))
    assert reg.count() == 5 * n_ok_docs
    kinds = dict(reg.groupby("kind").count().to_pandas().values)
    assert kinds == {k: n_ok_docs for k in ("email", "phone", "date", "id", "url")}


def test_entry_smoke(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    ds = mod.entry()
    assert ds.count() == 500
    assert "extracted_text" in ds.schema().names


def test_kmeans_fit_identical_at_any_partitioning(ray_session):
    """The integer-quantization claim, tested: block layout must not
    perturb a single centroid bit (int64 partial sums are associative;
    only the bounded combine divides)."""
    import numpy as np
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    from vlm_ocr_doc_reader_ray.stages.similarity import kmeans_fit

    a = kmeans_fit(
        rd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).repartition(2),
        k=10, iters=3,
    )
    b = kmeans_fit(
        rd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).repartition(17),
        k=10, iters=3,
    )
    assert set(a) == set(b)
    for c in a:
        np.testing.assert_array_equal(a[c], b[c])


def test_event_analytics_identical_at_any_partitioning(ray_session):
    """Funnel, retention, transitions, and windowed distinct must not
    depend on block layout: every result is pinned equal across a
    2-block and a 17-block read of the same events."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import (
        cohort_retention,
        event_transition_counts,
        funnel_counts,
        windowed_distinct_users,
    )

    sf = "/root/testdata/sf0.001"

    def run(nparts):
        ev = rd.read_parquet(
            f"{sf}/events.parquet",
            columns=["user_id", "ts", "event_type", "event_id"],
        ).repartition(nparts)
        return {
            "funnel": funnel_counts(ev, ["signup", "purchase", "error"])
            .to_pandas().sort_values("step").reset_index(drop=True),
            "cohort": cohort_retention(ev)
            .to_pandas().sort_values(["cohort_bucket", "offset"]).reset_index(drop=True),
            "trans": event_transition_counts(ev)
            .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True),
            "wdist": windowed_distinct_users(ev)
            .to_pandas().sort_values("window_start_s").reset_index(drop=True),
        }

    a, b = run(2), run(17)
    for k in a:
        pd.testing.assert_frame_equal(a[k], b[k])
