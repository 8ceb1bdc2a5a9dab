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


def doc_tiers(
    docs: rd.Dataset,
    entropy_min: float = 4.0,
    id_col: str = "doc_id",
    persist: str = "auto",
    spill_dir: str | None = None,
    keep_cols: tuple = (),
) -> rd.Dataset:
    """Tier extraction: classify every document into a training tier.

    The realistic final stage of a curation pipeline — each doc gets a
    ``tier`` label and a ``reason`` code from the engine's verified
    quality signals, composed the way a pre-training data team
    actually triages a crawl:

    1. ``quality_pass``  — Gopher word/length/symbol/stopword bands
       (:func:`stages.text_analysis.quality_filter`, defaults).
    2. ``gopher_pass``   — the full §A1.1 repetition-signal vector
       (:func:`stages.scrub.gopher_signals`, published thresholds).
    3. ``entropy_pass``  — char-entropy gibberish gate
       (:func:`stages.text_analysis.char_entropy_scores`,
       ``entropy >= entropy_min`` bits).
    4. ``bucket``        — CCNet head/middle/tail LM-quality tertile
       (:func:`stages.text_analysis.perplexity_buckets`).

    ``reason`` is the FIRST failing gate ('quality', 'repetition',
    'entropy') or 'ok'; ``tier`` is 'drop' on any failure, else the
    tertile mapped head→'high', middle→'mid', tail→'low'.

    Scale shape: ZERO joins, zero row shuffles, exactly two corpus
    reads (the theoretical minimum — the LM fit is inherently a
    separate pass). Read 1 fits the hashed-unigram LM (bounded
    residues). Read 2 chains ALL per-doc work: lean quality gate →
    repetition vector → entropy → NLL scoring (broadcast LM), each
    stage passing the accumulated flags through, collapsing to a
    narrow (id, flags, entropy, mean_nll) table pinned via the shared
    spill-capable ``pin()``. The tertile thresholds are two bounded
    residue passes over that pinned table, and the bucket + tier
    labels are a final vectorized projection on it. Reference analog:
    none — the beyond-reference triage layer over SURVEY §2's
    quality gates.
    """
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.scrub import gopher_signals
    from vlm_ocr_doc_reader_ray.stages.text_analysis import (
        char_entropy_scores,
        perplexity_buckets,
        quality_filter,
        unigram_nll_scores,
    )
    from vlm_ocr_doc_reader_ray.state.pin import pin

    extra = tuple(keep_cols)
    # read 2: one chain carrying every per-doc signal (flags — and any
    # caller keep_cols, e.g. source — ride along every stage)
    q = quality_filter(docs, lean=True).select_columns(
        [id_col, "text", "quality_pass", *extra]
    )
    g = gopher_signals(
        q, id_col=id_col, keep_cols=("text", "quality_pass", *extra)
    ).select_columns([id_col, "text", "quality_pass", "gopher_pass", *extra])
    e = char_entropy_scores(
        g, id_col=id_col,
        keep_cols=("text", "quality_pass", "gopher_pass", *extra),
    ).select_columns(
        [id_col, "text", "quality_pass", "gopher_pass", "entropy", *extra]
    )
    # NLL scoring chains onto the gate output; the LM FIT pass reads
    # the raw docs (fit_ds) so the gate lineage never executes twice
    scored = pin(
        unigram_nll_scores(
            e,
            id_col=id_col,
            keep_cols=["quality_pass", "gopher_pass", "entropy", *extra],
            fit_ds=docs,
        ).select_columns(
            [id_col, "n_words", "quality_pass", "gopher_pass", "entropy",
             "mean_nll", *extra]
        ),
        persist=persist,
        spill_dir=spill_dir,
        default="memory",
        label="doc_tiers_scored",
    )
    buckets = perplexity_buckets(
        scored,
        id_col=id_col,
        keep_cols=("n_words", "quality_pass", "gopher_pass", "entropy",
                   *extra),
    )

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        reason = pd.Series("ok", index=batch.index, dtype="object")
        reason[~batch["entropy"].ge(entropy_min)] = "entropy"
        reason[~batch["gopher_pass"]] = "repetition"
        reason[~batch["quality_pass"]] = "quality"
        tier = batch["bucket"].map(
            {"head": "high", "middle": "mid", "tail": "low"}
        ).astype("object")
        tier[reason != "ok"] = "drop"
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_words": batch["n_words"],
                "quality_pass": batch["quality_pass"],
                "gopher_pass": batch["gopher_pass"],
                "entropy_pass": batch["entropy"].ge(entropy_min),
                "bucket": batch["bucket"],
                "tier": tier,
                "reason": reason,
                **{c: batch[c] for c in extra},
            }
        )

    return buckets.map_batches(classify, batch_format="pandas")


def tier_report(
    docs: rd.Dataset,
    entropy_min: float = 4.0,
    id_col: str = "doc_id",
    persist: str = "auto",
    spill_dir: str | None = None,
) -> rd.Dataset:
    """Per-tier mixture summary over :func:`doc_tiers`: documents,
    word mass and half-up ppm share of total words per tier — the
    numbers a tiered training mixture is provisioned from.

    Scale shape: doc_tiers' two corpus reads, then per-batch
    combiners collapse the labeled stream to ≤4 residue rows per
    block before one tiny groupby; the ppm share is a driver-side
    projection over the ≤4-row result (bounded, annotated)."""
    import pandas as pd
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    labeled = doc_tiers(
        docs, entropy_min=entropy_min, id_col=id_col,
        persist=persist, spill_dir=spill_dir,
    )

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tier": batch.column("tier"),
                "n_docs": pa.array([1] * batch.num_rows, type=pa.int64()),
                "n_words": batch.column("n_words"),
            }
        )

    sums = grouped_sums(
        labeled.map_batches(partial, batch_format="pyarrow"),
        ["tier"], ["n_docs", "n_words"],
    ).to_pandas()  # bounded: <= 4 tiers
    tot = int(sums["n_words"].sum())
    sums["word_share_ppm"] = [
        (int(w) * 2_000_000 + tot) // (2 * tot) for w in sums["n_words"]
    ]
    return rd.from_pandas(
        pd.DataFrame(
            {
                "tier": sums["tier"],
                "n_docs": sums["n_docs"].astype("int64"),
                "n_words": sums["n_words"].astype("int64"),
                "word_share_ppm": pd.Series(
                    sums["word_share_ppm"], dtype="int64"
                ),
            }
        )
    )


def tiered_token_budget(
    docs: rd.Dataset,
    budgets: dict,
    entropy_min: float = 4.0,
    id_col: str = "doc_id",
    seed: str = "tiercap",
    persist: str = "auto",
    spill_dir: str | None = None,
) -> rd.Dataset:
    """Tier-budgeted corpus provisioning: :func:`doc_tiers` labels
    every document, 'drop' (and any tier absent from ``budgets``)
    is discarded, and each surviving tier keeps whole documents in
    deterministic md5 order under its OWN token budget
    (:func:`stages.text_analysis.grouped_token_cap` with per-group
    budgets) — "take 600k high-tier tokens, 300k mid, 100k low", the
    exact shape a tiered pre-training mixture is provisioned with.

    → (id, n_words, tier) kept rows; exact integers end to end, so
    the SQL mirror (windowed running sum with a CASE budget) is
    bit-identical at any parallelism.

    Scale shape: doc_tiers' two corpus reads; the cap then moves only
    O(budget/avg_len) rows per tier per block (exclusive-prefix local
    combiner), never the corpus."""
    from vlm_ocr_doc_reader_ray.stages.text_analysis import grouped_token_cap

    labeled = doc_tiers(
        docs, entropy_min=entropy_min, id_col=id_col,
        persist=persist, spill_dir=spill_dir,
    )
    allowed = [t for t in budgets if t != "drop"]

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(
            batch.column("tier"), value_set=pa.array(allowed, type=pa.string())
        )
        return batch.filter(mask).select([id_col, "n_words", "tier"])

    eligible = labeled.map_batches(keep, batch_format="pyarrow")
    return grouped_token_cap(
        eligible, "tier", id_col, "n_words", budget=0,
        seed=seed, budgets=budgets,
    )


def source_tier_profile(
    docs: rd.Dataset,
    entropy_min: float = 4.0,
    persist: str = "auto",
    spill_dir: str | None = None,
) -> rd.Dataset:
    """Per-source tier mix — the "which crawls yield high-tier data"
    report a curation team ranks sources by: for every source, doc
    counts per tier (high/mid/low/drop), total word mass of the kept
    tiers, and the half-up ppm share of docs that survived.

    Scale shape: doc_tiers keeps the source column riding through its
    signal chain (zero extra reads or joins — the chain is built on
    keep_cols threading), then per-batch combiners collapse to
    ≤ |sources| residue rows per block before one small groupby."""
    import pandas as pd
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    labeled = doc_tiers(
        docs, entropy_min=entropy_min, persist=persist,
        spill_dir=spill_dir, keep_cols=("source",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tier = batch.column("tier")
        one = pa.array([1] * batch.num_rows, type=pa.int64())
        zero = pa.array([0] * batch.num_rows, type=pa.int64())
        nw = batch.column("n_words")

        def flag(name):
            return pc.if_else(pc.equal(tier, name), one, zero)

        kept = pc.invert(pc.equal(tier, "drop"))
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": one,
                "n_high": flag("high"),
                "n_mid": flag("mid"),
                "n_low": flag("low"),
                "n_drop": flag("drop"),
                "kept_words": pc.if_else(kept, nw, zero),
            }
        )

    sums = grouped_sums(
        labeled.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        ["n_docs", "n_high", "n_mid", "n_low", "n_drop", "kept_words"],
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        kept = batch["n_docs"] - batch["n_drop"]
        batch["keep_ppm"] = (
            (kept * 2_000_000 + batch["n_docs"]) // (2 * batch["n_docs"])
        ).astype("int64")
        return batch

    return sums.map_batches(finish, batch_format="pandas")
