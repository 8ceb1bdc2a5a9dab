"""CLI arg grammar parity with the reference (``cli.py:47-108``)."""

import pytest

from vlm_ocr_doc_reader_ray.cli import parse_axes_arg, parse_pages_arg


class TestParsePages:
    def test_none_and_empty_mean_all(self):
        assert parse_pages_arg(None) is None
        assert parse_pages_arg("") is None
        assert parse_pages_arg("   ") is None

    def test_singles_and_ranges(self):
        assert parse_pages_arg("1,2,5-7") == [1, 2, 5, 6, 7]
        assert parse_pages_arg("3") == [3]
        assert parse_pages_arg("2-2") == [2]

    def test_dedupe_and_sort(self):
        assert parse_pages_arg("7,1,3-5,4") == [1, 3, 4, 5, 7]

    def test_errors(self):
        for bad in ["1-2-3", "0", "a", "2-1", "1,,2", "-3"]:
            with pytest.raises(ValueError):
                parse_pages_arg(bad)


class TestParseAxes:
    def test_default(self):
        assert parse_axes_arg(None) == [1, 3, 5]
        assert parse_axes_arg("") == [1, 3, 5]

    def test_explicit(self):
        assert parse_axes_arg("1,3,5") == [1, 3, 5]
        assert parse_axes_arg("2") == [2]

    def test_errors(self):
        for bad in ["0", "-1", "a", "1,x"]:
            with pytest.raises(ValueError):
                parse_axes_arg(bad)


class TestResolvePending:
    """Entity-granular resume (reference core/reader.py:266-276): only
    resolution<1 rows are re-processed; a second run finds nothing."""

    def _registry_with_pending(self, sf_small):
        import pyarrow as pa
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.pipelines.extraction import (
            extract,
            read_corpus,
            registry_table,
        )

        ex = extract(read_corpus(sf_small), emit_spans=False, emit_registry=True)
        reg = registry_table(ex)

        def demote_phones(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            is_phone = pc.equal(batch.column("kind"), "phone")
            res = pc.if_else(is_phone, pa.scalar(0, pa.int64()), batch.column("resolution"))
            val = pc.if_else(
                is_phone, pa.scalar("(stale)"), batch.column("value")
            )
            return batch.set_column(
                batch.column_names.index("resolution"), "resolution", res
            ).set_column(batch.column_names.index("value"), "value", val)

        return reg.map_batches(demote_phones, batch_format="pyarrow"), ex

    def test_only_pending_rows_processed_then_none(self, ray_session, sf_small):
        import pandas as pd

        from vlm_ocr_doc_reader_ray.stages.registry_stage import (
            pending_entities,
            resolve_pending,
        )

        reg, ex = self._registry_with_pending(sf_small)
        n_pending = pending_entities(reg, below_resolution=1).count()
        assert n_pending > 0

        merged = resolve_pending(reg, ex)
        mdf = merged.to_pandas()
        # every previously-pending row is now resolved (level >= 1) and
        # its stale value was re-extracted
        phones = mdf[mdf["kind"] == "phone"]
        assert (phones["resolution"] >= 1).all()
        assert not (phones["value"] == "(stale)").any()
        # non-pending rows kept their verified state untouched
        others = mdf[mdf["kind"] != "phone"]
        assert (others["resolution"] == 2).all()

        # second run: nothing pending, output byte-identical
        merged2 = resolve_pending(rd_from(mdf), ex)
        assert pending_entities(rd_from(mdf), below_resolution=1).count() == 0
        m2 = merged2.to_pandas()
        key = ["url", "entity_id"]
        pd.testing.assert_frame_equal(
            mdf.sort_values(key, ignore_index=True)[sorted(mdf.columns)],
            m2.sort_values(key, ignore_index=True)[sorted(mdf.columns)],
        )


def rd_from(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_cli_full_subprocess(ray_session, sf_small):
    """The legacy one-shot `full` surface writes text + structure +
    page states from one extraction pass (own Ray session, so driven
    in a subprocess)."""
    import shutil
    import subprocess
    import sys

    import pandas as pd

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    out = "/tmp/cli_full_test"
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
         "full", corpus, "-o", out, "--pages", "1"],
        cwd="/root/repo", capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ex = pd.read_parquet(f"{out}/extracted")
    heads = pd.read_parquet(f"{out}/headers")
    states = pd.read_parquet(f"{out}/page_states")
    assert len(ex) == 500
    assert set(heads.columns) == {"url", "level", "title", "page"}
    assert (states["page_num"] == 1).all()  # --pages grammar applied


def test_cli_shards_subprocess(ray_session, sf_small):
    """`shards` writes balanced md5-order training shards; a second
    invocation skips every finished shard and leaves bytes unchanged."""
    import hashlib
    import pathlib
    import shutil
    import subprocess
    import sys

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    out = "/tmp/cli_shards_test"
    shutil.rmtree(out, ignore_errors=True)

    def run():
        r = subprocess.run(
            [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli",
             "--num-cpus", "2", "shards", corpus, "-o", out,
             "--docs-per-shard", "150"],
            cwd="/root/repo", capture_output=True, text=True, timeout=240,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    out1 = run()
    assert "wrote 4 shards, skipped 0" in out1
    digests = {
        p.name: hashlib.md5(p.read_bytes()).hexdigest()
        for p in sorted(pathlib.Path(out).iterdir())
    }
    assert len(digests) == 4
    out2 = run()
    assert "wrote 0 shards, skipped 4" in out2
    assert digests == {
        p.name: hashlib.md5(p.read_bytes()).hexdigest()
        for p in sorted(pathlib.Path(out).iterdir())
    }


def test_cli_links_subprocess(ray_session, sf_small):
    """`links` writes the outlink table; --degree adds the per-host
    profile fed from the just-written parquet (no second tag scan).
    Row counts must agree between the two outputs."""
    import shutil
    import subprocess
    import sys

    import pandas as pd

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    out = "/tmp/cli_links_test"
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
         "links", corpus, "-o", out, "--degree"],
        cwd="/root/repo", capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    links = pd.read_parquet(f"{out}/links")
    deg = pd.read_parquet(f"{out}/host_degree")
    assert set(links.columns) == {"url", "pos", "href", "anchor_text", "chrome"}
    assert set(deg.columns) == {
        "host", "n_links", "n_chrome", "n_external", "n_distinct_targets"
    }
    assert deg["n_links"].sum() == len(links) > 0


def test_cli_dedup_spans_subprocess(ray_session, sf_small):
    """`dedup-spans` writes the span-deduplicated corpus; with
    reps=1 the corpus still carries cross-doc duplicated texts, so
    some tokens must drop while every doc row survives."""
    import shutil
    import subprocess
    import sys

    import pandas as pd

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    out = "/tmp/cli_sd_test"
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
         "dedup-spans", corpus, "-o", out],
        cwd="/root/repo", capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_parquet(out)
    assert set(df.columns) == {"url", "text", "n_kept", "n_dropped"}
    assert len(df) == 500
    assert (df["n_dropped"] > 0).any()
    assert (df["n_kept"] + df["n_dropped"] > 0).all()


def test_cli_curate_subprocess(ray_session, sf_small):
    """`curate` writes packed training sequences from the corpus."""
    import shutil
    import subprocess
    import sys

    import pandas as pd

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    out = "/tmp/cli_curate_test"
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
         "curate", corpus, "-o", out, "--seq-len", "512"],
        cwd="/root/repo", capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_parquet(out)
    assert len(df) > 0


def test_cli_index_search_subprocess(ray_session, sf_small):
    """`index` persists the bucket-partitioned term index; `search
    --index` retrieves through pruned reads; plain `search` runs BM25
    over the corpus. Both paths work with string url ids."""
    import shutil
    import subprocess
    import sys

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    idx = "/tmp/cli_term_index_test"
    shutil.rmtree(idx, ignore_errors=True)

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli",
             "--num-cpus", "2", *argv],
            cwd="/root/repo", capture_output=True, text=True, timeout=240,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    out1 = run("index", corpus, "-o", idx, "--buckets", "16")
    assert "wrote term index (16 buckets)" in out1

    out2 = run("search", idx, "--index", "--buckets", "16",
               "-q", "sort merge", "-k", "3")
    lines = [l for l in out2.splitlines() if l.startswith("q1\t")]
    assert len(lines) == 3 and "https://" in lines[0]

    out3 = run("search", corpus, "-q", "window", "-k", "2")
    lines = [l for l in out3.splitlines() if l.startswith("q1\t")]
    assert len(lines) == 2 and "https://" in lines[0]


def test_cli_tiers_subprocess(ray_session, sf_small):
    """`tiers` labels every corpus doc with a training tier and the
    first-failing-gate reason (own Ray session → subprocess)."""
    import shutil
    import subprocess
    import sys

    import pandas as pd

    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus = corpus_parquet(sf_small, reps=1)
    out = "/tmp/cli_tiers_test"
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
         "tiers", corpus, "-o", out],
        cwd="/root/repo", capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_parquet(out)
    assert len(df) == 500
    assert set(df.tier) <= {"high", "mid", "low", "drop"}
    assert set(df.loc[df.tier == "drop", "reason"]) <= {
        "quality", "repetition", "entropy"
    }
    assert (df.loc[df.tier != "drop", "reason"] == "ok").all()
    assert "(" in r.stdout and "=" in r.stdout  # mixture summary printed
