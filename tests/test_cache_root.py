"""The engine-wide cache-root resolver: every persisted artifact
(corpus cache, persisted indexes) must honor $GRAFT_CACHE_ROOT so a
multi-node deployment can point them at shared storage."""

from __future__ import annotations

import os


def test_cache_dir_resolves_env_lazily(monkeypatch):
    from vlm_ocr_doc_reader_ray.state.cache import cache_dir, cache_root

    monkeypatch.delenv("GRAFT_CACHE_ROOT", raising=False)
    assert cache_root() == "/tmp"
    monkeypatch.setenv("GRAFT_CACHE_ROOT", "/srv/shared")
    assert cache_root() == "/srv/shared"
    assert cache_dir("idx", "abc") == "/srv/shared/idx/abc"


def test_corpus_cache_honors_root(ray_session, sf_small, tmp_path,
                                  monkeypatch):
    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    monkeypatch.setenv("GRAFT_CACHE_ROOT", str(tmp_path))
    out = corpus_parquet(sf_small, reps=1)
    assert out.startswith(str(tmp_path))
    assert any(f.endswith(".parquet") for f in os.listdir(out))
