"""End-to-end corpus curation: the training-data factory in one call.

``curate`` chains the engine's LM-data operators the way a real
pre-training pipeline does:

    quality gate → exact dedup → mixture rebalance → sequence packing

Every stage is the already-verified operator (Gopher bands, min-id
keep-first, md5-threshold replication, concat-and-chunk over the
distributed prefix sum), so the COMPOSITION is also exactly
SQL-mirrorable — the ``curate`` driver query is gated by one chained
DuckDB CTE, not a weaker rows-only check. Deterministic end to end: a
pure function of the ``documents`` table at any parallelism.

Scale shape: the gate and the rebalance are pure projections, dedup
is one residue shuffle, packing is one residue pass + one row
shuffle. Nothing materializes on the driver, and the one pipeline
breaker (the gated stream, read by two dedup consumers) defaults to a
parquet spill checkpoint rather than an object-store pin — see
:func:`_persist` for the ``persist`` knob.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _persist(ds: rd.Dataset, mode: str, spill_dir: str | None) -> rd.Dataset:
    """Pipeline breaker with a bounded footprint.

    Thin wrapper over the engine-wide :func:`state.pin.pin` primitive
    that keeps ``curate``'s historical ``$GRAFT_CURATE_PERSIST`` env
    override (resolved before the shared ``$GRAFT_PIN_PERSIST``).
    ``memory`` pins in the object store, ``disk`` routes through a
    parquet spill checkpoint; ``auto`` defaults to ``disk`` because
    the gated stream here is corpus-sized."""
    import os

    from vlm_ocr_doc_reader_ray.state.pin import pin

    if mode == "auto":
        mode = os.environ.get("GRAFT_CURATE_PERSIST", "auto")
    return pin(ds, persist=mode, spill_dir=spill_dir, default="disk", label="curate")


def curate(
    docs: rd.Dataset,
    weights: dict,
    seq_len: int = 512,
    mix_seed: str = "mix",
    pack_seed: str = "pack",
    persist: str = "auto",
    spill_dir: str | None = None,
) -> rd.Dataset:
    """documents(doc_id, text, lang) → packed sequence segments
    ``(key, seq_id, off_in_seq, off_in_doc, n_tokens)`` where
    ``key = '{doc_id}#{rep}'`` names one replica of one surviving doc."""
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.dedup import dedup_exact
    from vlm_ocr_doc_reader_ray.stages.text_analysis import (
        mixture_rebalance,
        pack_sequences,
        quality_filter,
    )

    flagged = quality_filter(docs)

    def keep(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch.column("quality_pass"))
        return kept.select(["doc_id", "text", "lang"])

    # pipeline breaker: the gate's analyzer is the expensive stage and
    # the dedup exchange downstream would re-execute it per shuffle
    # pass (Ray sort-groupby samples + shuffles the lineage). Breaking
    # the lineage once = the analyzer runs exactly once (plan audit in
    # BASELINE.md); at scale this is the natural point a real pipeline
    # persists anyway — ``persist`` picks the footprint (see _persist).
    gated = _persist(
        flagged.map_batches(keep, batch_format="pyarrow"), persist, spill_dir
    )
    deduped = dedup_exact(gated, text_col="text", id_col="doc_id")
    replicated = mixture_rebalance(
        deduped, "doc_id", "lang", weights, seed=mix_seed
    )

    def key_and_count(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("doc_id"), pa.string()),
            pc.cast(batch.column("rep"), pa.string()),
            "#",
        )
        words = pc.split_pattern(batch.column("text"), " ")
        return pa.table(
            {"key": key,
             "nw": pc.cast(pc.list_value_length(words), pa.int64())}
        )

    keyed = replicated.map_batches(key_and_count, batch_format="pyarrow")
    return pack_sequences(keyed, "key", "nw", seq_len=seq_len, seed=pack_seed)
