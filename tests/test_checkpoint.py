"""Checkpoint / resume contract: crash mid-run, resume skips finished
partitions, outputs byte-identical to an uninterrupted run."""

import glob
import os
import shutil

import pandas as pd
import pytest

from vlm_ocr_doc_reader_ray.pipelines.checkpoint import run_checkpointed
from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet
from vlm_ocr_doc_reader_ray.state.manifest import read_manifests


@pytest.fixture(scope="module")
def corpus_files(ray_session, sf_small):
    import pyarrow.parquet as pq

    from vlm_ocr_doc_reader_ray.pipelines.extraction import synth_corpus

    path = "/tmp/ckpt_corpus"
    if not os.path.isdir(path):
        # four explicit input shards (the writer coalesces small blocks,
        # so shard manually for a deterministic 4-partition plan)
        table = pq.read_table(
            glob.glob(corpus_parquet(sf_small, reps=1) + "/*.parquet")[0]
        )
        os.makedirs(path + ".tmp", exist_ok=True)
        n = table.num_rows // 4
        for i in range(4):
            hi = table.num_rows if i == 3 else (i + 1) * n
            pq.write_table(
                table.slice(i * n, hi - i * n), f"{path}.tmp/shard-{i}.parquet"
            )
        os.replace(path + ".tmp", path)
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert len(files) == 4
    return files


def _hashes(out_root: str) -> pd.DataFrame:
    parts = sorted(glob.glob(f"{out_root}/part-*/extracted"))
    dfs = [
        pd.read_parquet(p, columns=["url", "text_sha256"]) for p in parts
    ]
    return pd.concat(dfs).sort_values("url", ignore_index=True)


def test_crash_then_resume_is_exact(ray_session, corpus_files):
    clean_root = "/tmp/ckpt_clean"
    crash_root = "/tmp/ckpt_crash"
    for p in (clean_root, crash_root):
        shutil.rmtree(p, ignore_errors=True)

    # uninterrupted run
    r = run_checkpointed(corpus_files, clean_root)
    assert r["skipped"] == [] and len(r["ran"]) == len(corpus_files)

    # crashed run: dies after partition 1
    with pytest.raises(RuntimeError, match="injected crash"):
        run_checkpointed(corpus_files, crash_root, fail_partition=1)
    assert set(read_manifests(crash_root)) == {0, 1}

    # resume: partitions 0,1 skipped, the rest run
    r2 = run_checkpointed(corpus_files, crash_root)
    assert r2["skipped"] == [0, 1]
    assert r2["ran"] == list(range(2, len(corpus_files)))

    # byte-identical outputs
    pd.testing.assert_frame_equal(_hashes(clean_root), _hashes(crash_root))


def test_resume_is_noop_when_complete(ray_session, corpus_files):
    out_root = "/tmp/ckpt_noop"
    shutil.rmtree(out_root, ignore_errors=True)
    run_checkpointed(corpus_files, out_root)
    r = run_checkpointed(corpus_files, out_root)
    assert r["ran"] == []
    assert len(r["skipped"]) == len(corpus_files)


def test_changed_input_invalidates_partition(ray_session, corpus_files, tmp_path):
    # copy inputs so we can touch one
    local = []
    for f in corpus_files:
        dst = tmp_path / os.path.basename(f)
        shutil.copy(f, dst)
        local.append(str(dst))
    out_root = str(tmp_path / "out")
    run_checkpointed(local, out_root)

    # modify one input file (replace with a valid, smaller shard) →
    # its partition must re-run
    target = sorted(local)[0]
    import pyarrow.parquet as pq

    t = pq.read_table(target)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), target)
    os.utime(target, (0, 0))
    r = run_checkpointed(local, out_root)
    assert r["ran"] == [0]
    assert 0 not in r["skipped"]


def test_manifest_lineage_table(ray_session, corpus_files):
    out_root = "/tmp/ckpt_clean"  # written by the first test
    mf = os.path.join(out_root, "manifest.parquet")
    assert os.path.exists(mf)
    df = pd.read_parquet(mf)
    assert set(df.columns) >= {
        "partition_id", "input_fingerprint", "row_count",
        "n_blocks_kept", "n_blocks_dropped", "parse_failures",
        "output_path", "engine_version",
    }
    assert df["row_count"].sum() == 500
    assert (df["parse_failures"] > 0).any()  # corrupt docs are counted
    # every partition ships all three derived tables
    for p in df["output_path"]:
        for sub in ("extracted", "registry", "page_states"):
            assert os.path.isdir(os.path.join(p, sub)), (p, sub)


def test_sigkill_then_resume_is_exact(ray_session, corpus_files):
    """Hard-kill hardening: SIGKILL the whole driver process group
    mid-run (not an injected exception), then resume must skip every
    completed partition and produce byte-identical output."""
    import signal
    import subprocess
    import sys
    import time

    clean_root = "/tmp/ckpt_sigkill_clean"
    crash_root = "/tmp/ckpt_sigkill_crash"
    for p in (clean_root, crash_root):
        shutil.rmtree(p, ignore_errors=True)

    run_checkpointed(corpus_files, clean_root)

    child = subprocess.Popen(
        [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
         "run", *corpus_files, "-o", crash_root],
        cwd="/root/repo",
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group: killpg nukes its Ray too
    )
    manifest_glob = f"{crash_root}/_manifest/part-*.json"
    deadline = time.time() + 180
    try:
        while time.time() < deadline:
            if glob.glob(manifest_glob) or child.poll() is not None:
                break
            time.sleep(0.2)
        assert glob.glob(manifest_glob), "child produced no checkpoint in time"
    finally:
        if child.poll() is None:
            os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=30)

    done = set(read_manifests(crash_root))
    assert 1 <= len(done) <= len(corpus_files)

    r = run_checkpointed(corpus_files, crash_root)
    assert r["skipped"] == sorted(done)
    assert sorted(r["ran"] + r["skipped"]) == list(range(len(corpus_files)))
    pd.testing.assert_frame_equal(_hashes(clean_root), _hashes(crash_root))


@pytest.mark.slow
def test_two_process_submit_kill_resubmit(ray_session, corpus_files):
    """The full job-submission lifecycle of the exactly-once claim, in
    TWO separate driver processes (the `ray job submit` shape, minus
    the dashboard this sandbox can't run): submit the checkpointed job
    as its own process with its own Ray, SIGKILL it from outside
    mid-partition, re-submit as a SECOND fresh process, and assert the
    re-submitted job skips completed partitions and the consolidated
    output is byte-identical to an uninterrupted run."""
    import signal
    import subprocess
    import sys
    import time

    clean_root = "/tmp/ckpt_2proc_clean"
    crash_root = "/tmp/ckpt_2proc_crash"
    for p in (clean_root, crash_root):
        shutil.rmtree(p, ignore_errors=True)

    run_checkpointed(corpus_files, clean_root)

    def submit(out_root):
        return subprocess.Popen(
            [sys.executable, "-m", "vlm_ocr_doc_reader_ray.cli", "--num-cpus", "2",
             "run", *corpus_files, "-o", out_root],
            cwd="/root/repo",
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            start_new_session=True,  # own process group: killpg nukes its Ray too
        )

    child = submit(crash_root)
    manifest_glob = f"{crash_root}/_manifest/part-*.json"
    deadline = time.time() + 180
    try:
        while time.time() < deadline:
            if glob.glob(manifest_glob) or child.poll() is not None:
                break
            time.sleep(0.2)
        assert glob.glob(manifest_glob), "job produced no checkpoint in time"
    finally:
        if child.poll() is None:
            os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=30)

    done = set(read_manifests(crash_root))
    assert 1 <= len(done) <= len(corpus_files)

    # re-submit: a SECOND fresh process completes the job
    child2 = submit(crash_root)
    out, _ = child2.communicate(timeout=300)
    assert child2.returncode == 0, out
    assert f"skipped {sorted(done)}" in out
    ran2 = set(range(len(corpus_files))) - done
    assert f"ran partitions {sorted(ran2)}" in out

    pd.testing.assert_frame_equal(_hashes(clean_root), _hashes(crash_root))

    # idempotence: a THIRD submission is a pure no-op
    child3 = submit(crash_root)
    out3, _ = child3.communicate(timeout=300)
    assert child3.returncode == 0, out3
    assert "ran partitions []" in out3
    pd.testing.assert_frame_equal(_hashes(clean_root), _hashes(crash_root))


def test_plan_partitions_packing(tmp_path):
    """Greedy byte packing: deterministic, covers every file exactly
    once, keeps sorted order, respects the byte target."""
    from vlm_ocr_doc_reader_ray.pipelines.checkpoint import plan_partitions

    files = []
    for i, size in enumerate([100, 100, 100, 250, 50, 50, 300, 10]):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(b"x" * size)
        files.append(str(p))

    # default: one file per partition
    assert plan_partitions(files) == {i: [f] for i, f in enumerate(sorted(files))}

    plan = plan_partitions(files, target_partition_bytes=300)
    flat = [f for fs in plan.values() for f in fs]
    assert flat == sorted(files)  # full coverage, sorted order
    assert plan == plan_partitions(files, target_partition_bytes=300)
    import os

    for pid, fs in plan.items():
        total = sum(os.path.getsize(f) for f in fs)
        # a partition only exceeds the target when a single file does
        assert total <= 300 or len(fs) == 1
