"""Tests for the shared spill-capable pipeline breaker (state/pin.py)
and the shard writer's lineage-aware auto-spill built on it."""

from __future__ import annotations

import os

import pandas as pd
import pytest


def _rows(n=50):
    return [{"k": i, "v": f"doc-{i:03d}"} for i in range(n)]


class TestPin:
    def test_memory_pin_roundtrip(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        ds = rd.from_items(_rows())
        out = pin(ds, persist="memory")
        assert sorted(r["k"] for r in out.take_all()) == list(range(50))

    def test_disk_pin_roundtrip_and_spill_files(self, ray_session, tmp_path):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        ds = rd.from_items(_rows())
        out = pin(ds, persist="disk", spill_dir=str(tmp_path), label="t1")
        got = sorted(out.take_all(), key=lambda r: r["k"])
        assert [r["v"] for r in got] == [f"doc-{i:03d}" for i in range(50)]
        spills = [d for d in os.listdir(tmp_path) if d.startswith("t1_spill_")]
        assert len(spills) == 1
        files = os.listdir(tmp_path / spills[0])
        assert files and all(f.endswith(".parquet") for f in files)

    def test_auto_resolves_env_then_default(self, ray_session, tmp_path,
                                            monkeypatch):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        ds = rd.from_items(_rows(10))
        # default wins when env unset
        monkeypatch.delenv("GRAFT_PIN_PERSIST", raising=False)
        monkeypatch.setenv("GRAFT_SPILL_DIR", str(tmp_path))
        pin(ds, persist="auto", default="disk", label="envtest")
        assert any(d.startswith("envtest_spill_") for d in os.listdir(tmp_path))
        # env overrides the call-site default
        monkeypatch.setenv("GRAFT_PIN_PERSIST", "memory")
        before = set(os.listdir(tmp_path))
        out = pin(ds, persist="auto", default="disk", label="envtest2")
        assert out.count() == 10
        assert set(os.listdir(tmp_path)) == before  # nothing spilled

    def test_invalid_mode_raises(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        with pytest.raises(ValueError, match="persist"):
            pin(rd.from_items(_rows(3)), persist="bogus")

    def test_empty_stream_disk_falls_back_with_schema(self, ray_session,
                                                      tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        empty = rd.from_arrow(
            pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.string())})
        ).filter(lambda r: False)
        out = pin(empty, persist="disk", spill_dir=str(tmp_path), label="e")
        assert out.count() == 0

    def test_disk_pin_strips_pandas_schema_metadata(self, ray_session,
                                                    tmp_path):
        """Blocks from pandas UDFs carry a `pandas` schema-metadata
        blob; the spill must not persist it (it breaks Ray's native
        join schema handling downstream)."""
        import ray
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        ds = rd.from_items(_rows()).map_batches(
            lambda df: df, batch_format="pandas"
        )
        out = pin(ds, persist="disk", spill_dir=str(tmp_path), label="m")
        for bundle in out.materialize().iter_internal_ref_bundles():
            for bref in bundle.block_refs:
                block = ray.get(bref)
                meta = block.schema.metadata
                assert not meta or b"pandas" not in meta

    def test_disk_pin_executes_lineage_once(self, ray_session, tmp_path):
        """The whole point of the pin: two downstream consumers of the
        returned Dataset re-read the spill, not the upstream lineage."""
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.state.pin import pin

        marker = tmp_path / "calls"
        marker.mkdir()

        def touch(df: pd.DataFrame) -> pd.DataFrame:
            import tempfile

            tempfile.mkstemp(dir=str(marker))
            return df

        ds = rd.from_items(_rows()).map_batches(
            touch, batch_format="pandas", batch_size=None
        )
        pinned = pin(ds, persist="disk", spill_dir=str(tmp_path), label="once")
        calls_after_pin = len(os.listdir(marker))
        assert calls_after_pin > 0  # the spill executed the lineage
        assert pinned.count() == 50  # consumer 1
        assert len(pinned.take_all()) == 50  # consumer 2
        assert len(os.listdir(marker)) == calls_after_pin  # no re-execution


class TestShardWriterAutoSpill:
    def test_is_cheap_lineage_classification(self, ray_session, sf_small):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.pipelines.shards import _is_cheap_lineage

        read = rd.read_parquet(
            os.path.join(sf_small, "documents.parquet"), columns=["doc_id"]
        )
        assert _is_cheap_lineage(read)
        assert _is_cheap_lineage(read.select_columns(["doc_id"]))
        assert _is_cheap_lineage(read.materialize())
        mapped = read.map_batches(lambda b: b, batch_format="pyarrow")
        assert not _is_cheap_lineage(mapped)

    def test_auto_spill_executes_expensive_lineage_once(self, ray_session,
                                                        tmp_path):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.pipelines.shards import (
            write_training_shards,
        )

        marker = tmp_path / "calls"
        marker.mkdir()

        def touch(df: pd.DataFrame) -> pd.DataFrame:
            import tempfile

            tempfile.mkstemp(dir=str(marker))
            return df

        def expensive(spill_root):
            os.environ["GRAFT_SPILL_DIR"] = str(spill_root)
            return rd.from_pandas(
                pd.DataFrame({"k": range(60), "t": [f"d{i}" for i in range(60)]})
            ).map_batches(touch, batch_format="pandas", batch_size=None)

        try:
            out_a = tmp_path / "auto"
            m_auto = write_training_shards(
                expensive(tmp_path), "k", str(out_a), 20, spill="auto"
            )
            calls_auto = len(os.listdir(marker))

            for f in os.listdir(marker):
                os.unlink(marker / f)
            out_n = tmp_path / "never"
            m_never = write_training_shards(
                expensive(tmp_path), "k", str(out_n), 20, spill="never"
            )
            calls_never = len(os.listdir(marker))
        finally:
            os.environ.pop("GRAFT_SPILL_DIR", None)

        # auto: lineage ran once (the spill; input is a single block).
        # never: at least rank leg + join leg (+ a schema probe).
        assert calls_auto == 1
        assert calls_never >= 2 * calls_auto

        # identical shard layout and byte-identical files either way
        assert list(m_auto["shard"]) == list(m_never["shard"])
        assert list(m_auto["rows"]) == list(m_never["rows"])
        for pa_, pn_ in zip(m_auto["path"], m_never["path"]):
            with open(pa_, "rb") as fa, open(pn_, "rb") as fn:
                assert fa.read() == fn.read()

    def test_spill_always_and_invalid(self, ray_session, tmp_path,
                                      monkeypatch):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.pipelines.shards import (
            write_training_shards,
        )

        monkeypatch.setenv("GRAFT_SPILL_DIR", str(tmp_path))
        ds = rd.from_pandas(pd.DataFrame({"k": range(10)}))
        m = write_training_shards(ds, "k", str(tmp_path / "o"), 5,
                                  spill="always")
        assert list(m["rows"]) == [5, 5]
        assert any(
            d.startswith("shards_input_spill_") for d in os.listdir(tmp_path)
        )
        with pytest.raises(ValueError, match="spill"):
            write_training_shards(ds, "k", str(tmp_path / "o2"), 5,
                                  spill="nope")
