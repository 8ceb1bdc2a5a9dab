"""Corpus-hygiene operators for LLM training-data pipelines: PII
scrubbing, within-document repetition stats (Gopher-style), corpus
n-gram counts, and C4-style cross-document line deduplication.

All four are expressed Ray-Data-first: pure per-batch projections
where the semantics are per-document (pii, repetition), pre-aggregated
combiners before any shuffle (ngram counts), and hash-partitioned
vectorized winner selection + ordered reassembly for the one
genuinely cross-document op (line dedup). Word tokenization is the
engine-wide ``split(' ')`` (== DuckDB ``string_split``) so every
operator is SQL-mirrorable in lockstep.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data as rd

# RE2-compatible (DuckDB regexp_* functions) AND Python-re-compatible
# patterns — only shared syntax (\d, \b, classes, bounded reps), so
# both engines match the exact same spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
EMAIL_MASK = "<EMAIL>"
IP_MASK = "<IP>"

_EMAIL_C = re.compile(EMAIL_RE)
_IPV4_C = re.compile(IPV4_RE)


def pii_scrub(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Mask emails then IPv4 literals; report per-doc match counts.

    Pure vectorized projection (pandas ``.str`` regex kernels — no
    Python loop over rows, no shuffle): the C4/RefinedWeb-style
    pre-training scrub pass. Masking order is part of the contract
    (emails first, then IPs over the already-masked text) so the SQL
    mirror composes ``regexp_replace`` identically."""

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].astype(str)
        n_emails = t.str.count(EMAIL_RE).astype("int64")
        masked = t.str.replace(_EMAIL_C, EMAIL_MASK, regex=True)
        n_ips = masked.str.count(IPV4_RE).astype("int64")
        scrubbed = masked.str.replace(_IPV4_C, IP_MASK, regex=True)
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_emails": n_emails,
                "n_ips": n_ips,
                "scrubbed": scrubbed,
            }
        )

    return ds.map_batches(scrub, batch_format="pandas")


def repetition_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_dup_fraction: float = 0.3,
) -> rd.Dataset:
    """Within-document repetition (Gopher quality rule): the fraction
    of word ``n``-grams that are repeats of an earlier one.

    Per-document projection, no shuffle. Documents shorter than ``n``
    words count as 1 n-gram (the whole text), duplicate fraction 0 —
    the same short-text rule as the minhash shingler."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        totals, distincts = [], []
        for t in batch[text_col].astype(str):
            ws = t.split(" ")
            if len(ws) < n:
                totals.append(1)
                distincts.append(1)
                continue
            grams = [" ".join(ws[i: i + n]) for i in range(len(ws) - n + 1)]
            totals.append(len(grams))
            distincts.append(len(set(grams)))
        total = pd.Series(totals, index=batch.index, dtype="int64")
        distinct = pd.Series(distincts, index=batch.index, dtype="int64")
        # exact cents-style fixed-point (×10^6, floor(+0.5)) so the
        # fraction compares bit-identically with the SQL mirror
        dup_ppm = ((total - distinct) * 1_000_000 * 2 + total) // (2 * total)
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_ngrams": total,
                "n_distinct": distinct,
                "dup_ppm": dup_ppm.astype("int64"),
                "repetition_pass": dup_ppm <= int(max_dup_fraction * 1_000_000),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def _ppm(num: int, den: int) -> int:
    """Half-up integer parts-per-million — the engine-wide fixed-point
    convention (`dup_ppm` in repetition_stats, `shared_ppm` in
    cross_doc_ngram_share): ``floor(num/den * 1e6 + 0.5)`` in exact
    integer arithmetic."""
    if den == 0:
        return 0
    return (num * 2_000_000 + den) // (2 * den)


def gopher_signals_one(t: str, line_words: int = 8) -> tuple:
    """Pure per-document Gopher §A1.1 signal kernel → ``(n_lines,
    dup_line_ppm, dup_line_char_ppm, top_2gram_char_ppm,
    dup_5gram_char_ppm)`` — module-level so the hypothesis
    differential test can pin it against an independent brute-force
    twin without a Ray session."""
    from collections import Counter

    ws = t.split(" ")
    nw = len(ws)
    nc = len(t)
    # --- deterministic 8-word lines (== line_dedup) ---
    lines = [
        " ".join(ws[i * line_words: (i + 1) * line_words])
        for i in range((nw + line_words - 1) // line_words)
    ]
    lc = Counter(lines)
    n_lines = len(lines)
    dup_lines = n_lines - len(lc)
    line_chars = sum(len(ln) for ln in lines)
    dup_line_chars = sum(
        (c - 1) * len(ln) for ln, c in lc.items() if c >= 2
    )
    # --- most frequent 2-gram char coverage ---
    top2_chars = 0
    if nw >= 2:
        g2 = Counter(" ".join(ws[i: i + 2]) for i in range(nw - 1))
        # max count, tie -> smallest gram
        g, c = min(g2.items(), key=lambda kv: (-kv[1], kv[0]))
        top2_chars = c * len(g)
    # --- duplicated 5-gram char coverage ---
    dup5_chars = 0
    if nw >= 5:
        g5 = Counter(" ".join(ws[i: i + 5]) for i in range(nw - 4))
        dup5_chars = sum(c * len(g) for g, c in g5.items() if c >= 2)
    return (
        n_lines,
        _ppm(dup_lines, n_lines),
        _ppm(dup_line_chars, line_chars),
        _ppm(top2_chars, nc),
        _ppm(dup5_chars, nc),
    )


def gopher_signals(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 8,
    max_dup_line: float = 0.30,
    max_dup_line_char: float = 0.20,
    max_top2_char: float = 0.20,
    max_dup5_char: float = 0.15,
    keep_cols: tuple = (),
) -> rd.Dataset:
    """The full Gopher §A1.1 within-document repetition-signal vector
    (Rae et al. 2021) — the multi-signal sibling of the single-n
    ``repetition_stats`` gate:

    - ``dup_line_ppm``: fraction of "lines" (deterministic
      ``line_words``-word chunks, the same line definition as
      ``line_dedup``) that repeat an earlier line in the doc.
    - ``dup_line_char_ppm``: characters in repeat-instance lines
      (every instance beyond the first of each distinct line) over
      total line characters.
    - ``top_2gram_char_ppm``: characters covered by occurrences of
      the single most frequent word 2-gram (ties → lexicographically
      smallest gram) over ``len(text)``.
    - ``dup_5gram_char_ppm``: characters covered by occurrences of
      duplicated word 5-grams (count ≥ 2) over ``len(text)``.
      Overlapping occurrences are counted per occurrence (the cheap
      deterministic contract), so this can exceed 1e6 on highly
      repetitive text — thresholds are parameters, not probabilities.
    - ``gopher_pass``: all four signals inside their bands (defaults
      are the published Gopher thresholds 0.30/0.20/0.20/0.15).

    All ratios are half-up integer ppm so the SQL mirror
    (``sqlmirror.GOPHER_SIGNALS_SQL``) compares bit-identically.

    Reference analog: none — beyond-reference corpus-quality signal.

    Scale shape: pure per-document projection over a 2-column read,
    zero shuffles; one Counter pass per doc (row-wise by the same
    measured A/B that keeps TextAnalyzer row-wise — the work is
    dict-building either way).
    """
    thr_line = int(max_dup_line * 1_000_000)
    thr_line_char = int(max_dup_line_char * 1_000_000)
    thr_top2 = int(max_top2_char * 1_000_000)
    thr_dup5 = int(max_dup5_char * 1_000_000)

    def signals(batch: pd.DataFrame) -> pd.DataFrame:
        n_lines_l, dup_line_l, dup_line_char_l, top2_l, dup5_l = (
            [], [], [], [], [],
        )
        for t in batch[text_col].astype(str):
            n_lines, dl, dlc, t2, d5 = gopher_signals_one(t, line_words)
            n_lines_l.append(n_lines)
            dup_line_l.append(dl)
            dup_line_char_l.append(dlc)
            top2_l.append(t2)
            dup5_l.append(d5)
        out = pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_lines": pd.Series(n_lines_l, index=batch.index, dtype="int64"),
                "dup_line_ppm": pd.Series(dup_line_l, index=batch.index, dtype="int64"),
                "dup_line_char_ppm": pd.Series(
                    dup_line_char_l, index=batch.index, dtype="int64"
                ),
                "top_2gram_char_ppm": pd.Series(top2_l, index=batch.index, dtype="int64"),
                "dup_5gram_char_ppm": pd.Series(dup5_l, index=batch.index, dtype="int64"),
            }
        )
        out["gopher_pass"] = (
            (out["dup_line_ppm"] <= thr_line)
            & (out["dup_line_char_ppm"] <= thr_line_char)
            & (out["top_2gram_char_ppm"] <= thr_top2)
            & (out["dup_5gram_char_ppm"] <= thr_dup5)
        )
        for c in keep_cols:
            out[c] = batch[c]
        return out

    return ds.map_batches(signals, batch_format="pandas")


_SIZE_WARN_SILENCED = False


def _silence_size_warnings() -> None:
    """Worker-side: drop Ray's empty-block size-estimation warning —
    the join and union legs here legitimately emit empty pandas
    blocks. Deliberately a DUPLICATE of
    ``aggregates.silence_empty_block_size_warnings``: worker batch
    fns must not import package modules at call time (the real
    import fails on workers that only have the pickled-by-value
    module, e.g. under a foreign cwd)."""
    global _SIZE_WARN_SILENCED
    if _SIZE_WARN_SILENCED:
        return
    import logging

    class _DropEmptySizeWarning(logging.Filter):
        def filter(self, record: "logging.LogRecord") -> bool:
            msg = record.getMessage()
            return not (
                "Error calculating size for column" in msg
                and "size 0 inputs" in msg
            )

    logging.getLogger("ray.data._internal.pandas_block").addFilter(
        _DropEmptySizeWarning()
    )
    _SIZE_WARN_SILENCED = True


def _batch_word_ngrams(texts: pd.Series, n: int):
    """Vectorized word n-gram builder over a batch of texts.

    Flattens every doc's words into one array, builds n-grams by
    shifted array joins, and masks windows that straddle a document
    boundary. Returns ``(grams, doc_idx)`` — parallel arrays of the
    n-gram strings and the 0-based position (within the batch) of the
    document each came from — so callers can count globally (census)
    or per document (contamination) without re-tokenizing. Documents
    shorter than ``n`` words contribute no n-grams."""
    import numpy as np

    word_lists = texts.astype(str).str.split(" ")
    lens = word_lists.str.len().to_numpy()
    empty = (
        np.array([], dtype=object),
        np.array([], dtype=np.int64),
    )
    if len(lens) == 0:
        return empty
    flat = np.concatenate(word_lists.to_numpy())
    n_windows = len(flat) - n + 1
    if n_windows <= 0:
        return empty
    valid = np.ones(n_windows, dtype=bool)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    bounds = starts[1:]  # first word index of docs 1..k
    for off in range(1, n):
        cross = bounds - off  # window at this start crosses a boundary
        cross = cross[(cross >= 0) & (cross < n_windows)]
        valid[cross] = False
    grams = pd.Series(flat[:n_windows][valid])
    for off in range(1, n):
        grams = grams + " " + pd.Series(flat[off: off + n_windows][valid])
    # document of each surviving window = index of the doc whose word
    # range contains the window start
    win_starts = np.nonzero(valid)[0]
    doc_idx = np.searchsorted(starts, win_starts, side="right") - 1
    return grams.to_numpy(), doc_idx.astype(np.int64)


def arrow_word_ngram_positions(texts, n: int):
    """Arrow-native word n-gram builder: ``split_pattern`` →
    ``list_flatten`` → shifted ``binary_join_element_wise`` — every
    step a C kernel, no Python string objects (measured ~4× the
    pandas :func:`_batch_word_ngrams` on the 500k-doc census).

    ``texts`` is a pyarrow String(Chunked)Array; returns
    ``(grams, doc_idx, pos)``: a pyarrow StringArray of the n-grams
    (doc boundary windows masked out, same contract as the pandas
    twin — ``split_pattern(' ')`` matches Python ``split(' ')``
    including empty-token runs), the int64 batch-position of each
    gram's document, and the 0-based WORD offset of the window start
    within that document (what span-level dedup needs)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    empty = (
        pa.array([], type=pa.string()),
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
    )
    if len(texts) == 0:
        return empty
    words = pc.split_pattern(texts, " ")
    lens = pc.list_value_length(words).to_numpy().astype(np.int64)
    flat = pc.list_flatten(words)
    n_windows = len(flat) - n + 1
    if n_windows <= 0:
        return empty
    valid = np.ones(n_windows, dtype=bool)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    bounds = starts[1:]
    for off in range(1, n):
        cross = bounds - off
        cross = cross[(cross >= 0) & (cross < n_windows)]
        valid[cross] = False
    if n == 1:
        grams = flat
    else:
        parts = [flat.slice(off, n_windows) for off in range(n)]
        # separator type must match the data (parquet reads come in
        # as large_string; a plain " " python arg binds as string and
        # has no mixed kernel)
        sep = pa.scalar(" ", type=flat.type)
        grams = pc.binary_join_element_wise(*parts, sep)
    win_starts = np.nonzero(valid)[0]
    doc_idx = np.searchsorted(starts, win_starts, side="right") - 1
    pos = win_starts - starts[doc_idx]
    mask = pa.array(valid)
    grams = grams if valid.all() else pc.array_filter(grams, mask)
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return grams, doc_idx.astype(np.int64), pos.astype(np.int64)


def arrow_word_ngrams(texts, n: int):
    """(grams, doc_idx) view of :func:`arrow_word_ngram_positions`
    for callers that don't need within-doc offsets."""
    grams, doc_idx, _ = arrow_word_ngram_positions(texts, n)
    return grams, doc_idx


def ngram_counts(
    ds: rd.Dataset,
    text_col: str = "text",
    n: int = 2,
    top_k: int = 20,
) -> rd.Dataset:
    """Global top-``top_k`` word ``n``-grams by corpus frequency.

    The LM-data census op. Per-batch explode + LOCAL count collapses
    each batch to its distinct n-grams before anything moves
    (combiner), the global sum is a pre-aggregated groupby over those
    residues, and the final top-k uses the local-k merge — the corpus
    itself never shuffles. Total order: count desc, n-gram asc."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.relational import top_k as _top_k

    def explode_count(batch: pa.Table) -> pa.Table:
        grams, _ = arrow_word_ngrams(batch.column(text_col), n)
        vc = pc.value_counts(grams)
        return pa.table(
            {"ngram": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(explode_count, batch_format="pyarrow")

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def sum_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("ngram", sort=False, as_index=False)["n"].sum()

    totals = partitioned_apply(partials, ["ngram"], sum_part)
    return _top_k(totals, "n", top_k, "ngram")


def line_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
) -> rd.Dataset:
    """C4-style cross-document line deduplication: every distinct line
    survives ONLY in its first occurrence (min ``(doc_id, line_idx)``)
    and documents are reassembled from their surviving lines in order.

    The corpus text has no newlines, so "lines" are deterministic
    ``words_per_line``-word chunks — the same construction the SQL
    mirror uses. Three stages, all vectorized per partition:

    1. explode to (doc_id, line_idx, line) rows (per-batch, no
       shuffle);
    2. ONE hash shuffle by line: each partition keeps the winning
       occurrence per distinct line with a vectorized sort +
       drop_duplicates and emits the winner keys;
    3. ONE hash shuffle by doc: surviving lines re-join in line order
       (groupby + ordered join per partition — the G4 ordered-concat
       shape).
    """
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, lines = [], [], []
        for d, t in zip(batch[id_col], batch[text_col].astype(str)):
            ws = t.split(" ")
            for j in range(0, len(ws), words_per_line):
                ids.append(d)
                idxs.append(j // words_per_line)
                lines.append(" ".join(ws[j: j + words_per_line]))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "line_idx": pd.Series(idxs, dtype="int64"),
                "line": pd.Series(lines, dtype="object"),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pandas")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([id_col, "line_idx"]).drop_duplicates(
            "line", keep="first"
        )

    # per-batch combiner first: a batch's duplicate lines collapse
    # before the shuffle moves anything
    combined = exploded.map_batches(keep_first, batch_format="pandas")
    winners = partitioned_apply(combined, ["line"], keep_first)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_idx"])
        out = g.groupby(id_col, sort=False)["line"].agg(" ".join).reset_index()
        counts = g.groupby(id_col, sort=False)["line"].size().reset_index(name="n_lines_kept")
        out = out.merge(counts, on=id_col)
        return out.rename(columns={"line": "text"})

    return partitioned_apply(winners, [id_col], reassemble)


def span_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    hashed: bool = False,
    persist: str = "auto",
    spill_dir: str | None = None,
) -> rd.Dataset:
    """Exact duplicated-SPAN removal, the substring-level companion to
    :func:`line_dedup` (the "dedup the repeated spans, keep the rest
    of the doc" step of Lee et al. 2022, approximated at word-n-gram
    granularity): every word whose position is covered by ANY word
    n-gram occurring >= ``min_count`` times corpus-wide is dropped,
    and each document is reassembled from its surviving words in
    order. → ``(doc_id, text, n_kept, n_dropped)``.

    Reference analog: none — beyond-reference training-data op.
    DuckDB mirror: ``sqlmirror.SPAN_DEDUP_SQL`` (window-max over the
    duplicate-start flags == the diff/cumsum interval marking here).

    Stages:
    1. per-batch Arrow n-gram explode to ``(gram, doc_id, pos)`` — C
       kernels, no shuffle;
    2. ONE hash shuffle by gram: each partition holds every
       occurrence of its grams, so a vectorized ``transform('size')``
       finds the duplicated ones and emits their ``(doc_id, pos)``;
    3. the duplicate-span starts collapse to one list row per doc
       (residue shuffle) and LEFT-join back to the input via Ray's
       hash-partitioned join; a final ``map_batches`` rebuilds each
       text by diff-marking covered intervals ``[pos, pos+n)``.

    Scale shape: the gram shuffle is the n-gram census residue (same
    volume as :func:`ngram_counts`); the join's right side holds one
    row per doc that contains a duplicated span.

    ``hashed=True`` is the 100-TB path: grams AND doc ids collapse to
    64-bit siphashes before anything moves (the string mode ships
    every occurrence's url+gram through the sort shuffle, the hashed
    mode ships three int64s), and the exploded residue is pinned so
    the sort shuffle's boundary sampling never re-runs the explode
    lineage. Measured on the 500k-doc bench corpus with url ids at
    32 CPUs: 118s string → 53s hashed → 23s hashed + the vectorized
    rebuild below. Semantics are identical up to 64-bit collisions
    (birthday bound ~7e-5 for one colliding PAIR at 5e7 grams; a
    collision can only over-drop). The default string mode is what
    the DuckDB mirror checks bit-for-bit."""
    import numpy as np
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.relational import (
        bloom_anti_join_dataset,
        partitioned_hash_join,
    )

    key = "__key" if hashed else id_col

    def explode(batch: pa.Table) -> pd.DataFrame:
        grams, doc_idx, pos = arrow_word_ngram_positions(
            batch.column(text_col), n
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if hashed:
            gh = pd.util.hash_pandas_object(
                pd.Series(grams.to_pandas(), dtype="object"), index=False
            ).to_numpy().view(np.int64)
            idh = pd.util.hash_pandas_object(
                pd.Series(ids), index=False
            ).to_numpy().view(np.int64)
            return pd.DataFrame(
                {
                    "gram": pd.Series(gh, dtype="int64"),
                    key: pd.Series(
                        idh[doc_idx] if len(doc_idx) else [], dtype="int64"
                    ),
                    "pos": pd.Series(pos, dtype="int64"),
                }
            )
        # id dtype is preserved (int64 doc ids OR string urls both
        # work as identity); empty batches pin the same dtype so
        # blocks stay schema-stable
        return pd.DataFrame(
            {
                "gram": pd.Series(grams.to_pandas(), dtype="object"),
                id_col: pd.Series(
                    ids[doc_idx] if len(doc_idx) else [], dtype=ids.dtype
                ),
                "pos": pd.Series(pos, dtype="int64"),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    if hashed:
        # pin the int64 residue: without this the partitioned_apply
        # sort shuffle's boundary sampling re-executes the explode
        # lineage (the repo's standing sort-shuffle finding). The
        # residue is TOKEN-scale (one row per word position of the
        # corpus — larger than the corpus itself at 100 TB), so the
        # pin defaults to a parquet spill, not an object-store
        # materialize; persist="memory" opts back in for small runs.
        from vlm_ocr_doc_reader_ray.state.pin import pin

        exploded = pin(
            exploded,
            persist=persist,
            spill_dir=spill_dir,
            default="disk",
            label="span_grams",
        )

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("gram", sort=False)["gram"].transform("size")
        return g.loc[c >= min_count, [key, "pos"]]

    covered = partitioned_apply(exploded, ["gram"], dup_positions)

    def to_lists(g: pd.DataFrame) -> pd.DataFrame:
        # comma-joined string, not a list column: Arrow's acero join
        # (inside Ray's native hash join) rejects list-typed payload
        # fields. Positions stringify ONCE as a column (C path), so
        # the per-group call is a plain ','.join, not a map(str, ...)
        pos_str = g["pos"].astype(str)
        agg = (
            pos_str.groupby(g[key].to_numpy(), sort=False)
            .agg(",".join)
            .rename("dup_starts")
            .rename_axis("__did")
            .reset_index()
        )
        return agg

    # bounded residue (one row per dup-containing doc); materialized so
    # the empty-right-side join guard (schema loss, see dedup.py) is a
    # cheap count, not a lineage re-run
    starts_per_doc = partitioned_apply(covered, [key], to_lists).materialize()

    def passthrough(batch: pd.DataFrame) -> pd.DataFrame:
        _silence_size_warnings()
        nw = batch[text_col].astype(str).str.split(" ").str.len()
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "text": batch[text_col].astype(str),
                "n_kept": nw.astype("int64"),
                "n_dropped": pd.Series(0, index=batch.index, dtype="int64"),
            }
        )

    n_dup_docs = starts_per_doc.count()
    if n_dup_docs == 0:
        return ds.map_batches(passthrough, batch_format="pandas")

    # Ray's sort/map_groups emits schema-LESS empty blocks for key
    # ranges holding no rows (they break both joins' key projection).
    # Repartition folds them into typed blocks (concat repair) —
    # sized so a block stays ~50k residue rows at any scale.
    starts_per_doc = starts_per_doc.repartition(
        max(1, min(200, n_dup_docs // 50_000 + 1))
    )

    if hashed:

        def add_key(batch: pd.DataFrame) -> pd.DataFrame:
            _silence_size_warnings()
            batch = batch.copy()
            # same construction as the explode side, so the 64-bit
            # keys agree
            batch[key] = (
                pd.util.hash_pandas_object(batch[id_col], index=False)
                .to_numpy()
                .view(np.int64)
            )
            return batch

        left = ds.map_batches(add_key, batch_format="pandas")
    else:
        left = ds

    # Join impl by cluster size (both are measured): Ray's native
    # hash join is ~1.5× faster at 500k docs (22.9s vs 34.5s) but its
    # HashShuffleAggregator actor pool starves 2–4-CPU clusters
    # (observed CLI hang at 2 CPUs). Small clusters take the fully
    # TASK-based pair instead: docs WITH dup spans through the inner
    # bucketed hash join, docs WITHOUT through the Bloom anti-join
    # (no shuffle for the bulk) and an unchanged passthrough.
    import ray as _ray

    use_native = _ray.cluster_resources().get("CPU", 0) >= 8
    if use_native:
        from vlm_ocr_doc_reader_ray.stages.relational import native_hash_join

        joined = native_hash_join(
            left, starts_per_doc, key, "__did", join_type="left_outer"
        )
        clean = None
    else:
        joined = partitioned_hash_join(left, starts_per_doc, key, "__did")
        clean = bloom_anti_join_dataset(left, starts_per_doc, key, "__did")
        if hashed:
            clean = clean.select_columns([id_col, text_col])

    def rebuild(batch: pd.DataFrame) -> pd.DataFrame:
        _silence_size_warnings()
        # fully vectorized interval marking over the batch's FLAT word
        # array: one C-speed split, one diff/cumsum over all docs at
        # once, one list-join back — no per-word Python (the row-loop
        # twin measured ~3× slower on the 500k-doc bench corpus)
        import pyarrow.compute as pc

        texts = pa.array(batch[text_col].astype(str))
        words = pc.split_pattern(texts, " ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_docs = len(batch)
        doc_off = np.concatenate(([0], np.cumsum(lens)))
        total = int(doc_off[-1])

        st_col = batch["dup_starts"]
        valid = st_col.notna() & (st_col != "")
        sts = st_col[valid]
        if len(sts):
            # ONE join + ONE split for the whole batch's position
            # lists, not a parse per row
            all_starts = np.array(
                ",".join(sts.tolist()).split(","), dtype=np.int64
            )
            counts = np.zeros(n_docs, dtype=np.int64)
            counts[valid.to_numpy()] = sts.str.count(",").to_numpy() + 1
            abs_start = all_starts + np.repeat(doc_off[:-1], counts)
            ends = np.minimum(abs_start + n, np.repeat(doc_off[1:], counts))
            diff = np.zeros(total + 1, dtype=np.int64)
            np.add.at(diff, abs_start, 1)
            np.add.at(diff, ends, -1)
            keep = np.cumsum(diff[:-1]) <= 0
        else:
            keep = np.ones(total, dtype=bool)

        doc_idx = np.repeat(np.arange(n_docs), lens)
        kept_counts = np.bincount(doc_idx[keep], minlength=n_docs).astype(
            np.int64
        )
        flat_kept = pc.array_filter(flat, pa.array(keep))
        if isinstance(flat_kept, pa.ChunkedArray):
            flat_kept = flat_kept.combine_chunks()
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), flat_kept
        ) if flat_kept.type == pa.large_string() else pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), flat_kept
        )
        new_text = pc.binary_join(lists, pa.scalar(" ", type=flat_kept.type))

        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "text": pd.Series(
                    new_text.to_pandas().to_numpy(), dtype="object"
                ),
                "n_kept": pd.Series(kept_counts, dtype="int64"),
                "n_dropped": pd.Series(lens - kept_counts, dtype="int64"),
            }
        )

    rebuilt = joined.map_batches(rebuild, batch_format="pandas")
    if clean is None:  # native left-outer: rebuild handles null starts
        return rebuilt
    return rebuilt.union(clean.map_batches(passthrough, batch_format="pandas"))


def eval_ngram_set(
    eval_ds: rd.Dataset, text_col: str = "text", n: int = 13
) -> frozenset:
    """Collect the distinct word ``n``-grams of a (small) benchmark /
    eval dataset as a driver-side frozenset.

    Contract: the eval side of a decontamination pass is the
    BENCHMARK suite — megabytes, not the corpus — so collecting its
    distinct n-grams to the driver and broadcasting them is the
    correct 100-TB shape (one ``ray.put``, read by every task), not a
    shortcut. The distinct-per-partition combiner runs distributed
    first so the driver only ever receives the true distinct set."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import distinct_values

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        grams, _ = _batch_word_ngrams(batch[text_col], n)
        return pd.DataFrame({"ngram": pd.Series(grams, dtype="object").drop_duplicates()})

    distinct = distinct_values(
        eval_ds.map_batches(explode, batch_format="pandas"), "ngram"
    )
    return frozenset(
        r["ngram"] for r in distinct.iter_rows()
    )


def contamination_check(
    ds: rd.Dataset,
    eval_ngrams,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> rd.Dataset:
    """GPT-3/PaLM-style benchmark decontamination: per document, how
    many of its word ``n``-grams appear in the eval set's n-grams.

    ``eval_ngrams`` is a frozenset (see :func:`eval_ngram_set`) or a
    ``ray.ObjectRef`` to one — passed by reference either way, so the
    set ships to each worker once, never per batch. The scan itself is
    a pure per-batch projection (no shuffle): vectorized n-gram build
    + hash-set membership + ``bincount`` per document. Output:
    ``(id_col, n_ngrams, n_eval_hits, contaminated)`` for every input
    document (docs shorter than ``n`` words have 0 n-grams and are
    clean)."""
    import numpy as np
    import ray

    ref = (
        eval_ngrams
        if isinstance(eval_ngrams, ray.ObjectRef)
        else ray.put(eval_ngrams)
    )

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        # one object-store fetch per task (tasks see the ref, not a
        # per-batch copy of the set)
        ev = ray.get(ref)
        grams, doc_idx = _batch_word_ngrams(batch[text_col], n)
        n_docs = len(batch)
        totals = np.bincount(doc_idx, minlength=n_docs).astype("int64")
        if len(grams):
            hit_mask = pd.Series(grams).isin(ev).to_numpy()
            hits = np.bincount(
                doc_idx[hit_mask], minlength=n_docs
            ).astype("int64")
        else:
            hits = np.zeros(n_docs, dtype="int64")
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_ngrams": totals,
                "n_eval_hits": hits,
                "contaminated": hits > 0,
            }
        )

    return ds.map_batches(scan, batch_format="pandas")


def boilerplate_overlap(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_count: int = 40,
) -> rd.Dataset:
    """Per-document overlap with corpus-frequent n-grams — the
    boilerplate detector (docs dominated by site-wide navigation /
    footer n-grams score high and get filtered before training).

    Two composed stages, both scale-bounded: the EXACT heavy-hitter
    set (count >= ``min_count``) comes from the two-pass count-min
    filter (:func:`~vlm_ocr_doc_reader_ray.stages.sketch.heavy_hitters`
    — only residues shuffle), is broadcast ONCE with ``ray.put`` (its
    size is bounded by corpus_ngrams / min_count by pigeonhole), and a
    second pass scores every doc with Arrow C kernels
    (:func:`arrow_word_ngrams` + ``is_in`` + ``bincount``). Output:
    one ``(id, ngrams, hits)`` row per doc (integer-exact; docs with
    fewer than ``n`` words score 0/0) — downstream filters on
    ``hits/ngrams`` at whatever ratio suits the corpus."""
    import numpy as np
    import pyarrow as pa
    import ray

    from vlm_ocr_doc_reader_ray.stages.sketch import heavy_hitters

    def explode(batch: pa.Table) -> pa.Table:
        grams, _ = arrow_word_ngrams(batch.column(text_col), n)
        return pa.table({"__ngram": grams})

    stream = ds.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    hitters = heavy_hitters(stream, "__ngram", threshold=min_count).to_pandas()
    hit_ref = ray.put(pa.array(hitters["__ngram"], type=pa.string()))

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        grams, doc_idx = arrow_word_ngrams(batch.column(text_col), n)
        total = np.bincount(doc_idx, minlength=len(batch)).astype(np.int64)
        hit_set = ray.get(hit_ref)
        if len(grams) and len(hit_set):
            m = pc.is_in(grams, value_set=hit_set)
            hits = np.bincount(
                doc_idx[m.to_numpy(zero_copy_only=False)],
                minlength=len(batch),
            ).astype(np.int64)
        else:
            hits = np.zeros(len(batch), dtype=np.int64)
        return pa.table(
            {id_col: batch.column(id_col),
             "ngrams": pa.array(total),
             "hits": pa.array(hits)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def cross_doc_ngram_share(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> rd.Dataset:
    """Per-document share of its DISTINCT word ``n``-grams that occur
    in at least one OTHER document — the cross-document duplication
    signal (RefinedWeb/Dolma-style dedup pressure, the corpus-level
    twin of the in-document Gopher repetition stats). A doc scoring
    high is boilerplate-heavy or a diffuse near-duplicate even when no
    single pair crosses a near-dup threshold.

    Scale shape: docs collapse in-map to distinct ``(doc_id, ngram)``
    residues; ONE hash shuffle on the gram co-locates every holder of
    each gram, so a gram-partition computes exact document frequencies
    locally and emits per-doc PARTIAL shared counts; a residue groupby
    on ``id_col`` sums partials with the in-map per-doc totals. Unlike
    :func:`boilerplate_overlap` (threshold-bounded broadcast set), the
    shared-gram set here is unbounded (any gram held by >= 2 docs), so
    the attribution is partitioned, never broadcast — no driver or
    worker ever holds the shared set. Output one row per input doc:
    ``(id_col, n_ngrams, n_shared, shared_ppm)`` with the engine-wide
    half-up integer ppm convention; docs with fewer than ``n`` words
    score 0/0/0.
    """
    import numpy as np
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )

    src = ds.select_columns([id_col, text_col])

    def residues(batch: pa.Table) -> pd.DataFrame:
        grams, doc_idx = arrow_word_ngrams(batch.column(text_col), n)
        ids = batch.column(id_col).take(pa.array(doc_idx, type=pa.int64()))
        df = pd.DataFrame({id_col: ids.to_pandas(), "__ngram": grams.to_pandas()})
        return df.drop_duplicates()

    def totals(batch: pa.Table) -> pd.DataFrame:
        # every input doc appears exactly once, zero-gram docs included
        grams, doc_idx = arrow_word_ngrams(batch.column(text_col), n)
        cnt = np.zeros(len(batch), dtype=np.int64)
        if len(doc_idx):
            d = pd.DataFrame(
                {"i": doc_idx, "g": grams.to_pandas()}
            ).drop_duplicates()
            vc = d.groupby("i").size()
            cnt[vc.index.to_numpy()] = vc.to_numpy()
        return pd.DataFrame(
            {
                id_col: batch.column(id_col).to_pandas(),
                "n_ngrams": cnt,
                "n_shared": np.zeros(len(batch), dtype=np.int64),
            }
        )

    def share_part(g: pd.DataFrame) -> pd.DataFrame:
        id_dtype = g[id_col].dtype if id_col in g.columns else "int64"
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype=id_dtype),
                "n_ngrams": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        # all holders of a gram are co-located: transform size IS the
        # gram's global document frequency
        freq = g.groupby("__ngram")[id_col].transform("size")
        shared = g.loc[freq.to_numpy() >= 2]
        if shared.empty:
            return empty
        c = shared.groupby(id_col, sort=False).size().reset_index(name="n_shared")
        c["n_ngrams"] = np.int64(0)
        return c[[id_col, "n_ngrams", "n_shared"]]

    res = src.map_batches(residues, batch_format="pyarrow")
    partials = partitioned_apply(res, ["__ngram"], share_part)
    base = src.map_batches(totals, batch_format="pyarrow")
    summed = grouped_sums(base.union(partials), [id_col], ["n_ngrams", "n_shared"])

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nn = pc.cast(batch.column("n_ngrams"), pa.int64())
        sh = pc.cast(batch.column("n_shared"), pa.int64())
        nn_np = nn.to_numpy(zero_copy_only=False)
        sh_np = sh.to_numpy(zero_copy_only=False)
        ppm = np.zeros(len(nn_np), dtype=np.int64)
        m = nn_np > 0
        ppm[m] = (sh_np[m] * 2_000_000 + nn_np[m]) // (2 * nn_np[m])
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_ngrams": nn,
                "n_shared": sh,
                "shared_ppm": pa.array(ppm),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def blocklist_filter(
    ds: rd.Dataset,
    col: str,
    blocked,
    invert: bool = False,
) -> rd.Dataset:
    """Domain/source blocklist gate (the C4-style banned-domains
    step): drop rows whose ``col`` value is in ``blocked``. The list
    ships ONCE via ``ray.put`` and membership is one Arrow ``is_in``
    kernel per batch — no shuffle, no per-row Python.
    ``invert=True`` keeps ONLY blocked rows (the audit stream)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    ref = ray.put(pa.array(sorted(set(blocked)), type=pa.string()))

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(col), value_set=ray.get(ref))
        return batch.filter(m if invert else pc.invert(m))

    return ds.map_batches(keep, batch_format="pyarrow")


_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")


def normalize_text(
    ds: rd.Dataset, text_col: str = "text", out_col: str = "text_norm"
) -> rd.Dataset:
    """Canonical text normalization before hashing/dedup: Unicode NFC,
    ASCII-whitespace runs collapsed to one space, edges trimmed — the
    cleanup pass that makes byte-level dedup see through encoding and
    spacing variance. Deliberately NO case folding: Unicode lowercasing
    differs between Python and utf8proc (İ, ß), which would break the
    engine↔SQL lockstep; casefold explicitly downstream if wanted.
    Mirrored verbatim by ``trim(regexp_replace(nfc_normalize(x),
    '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))``. Pure per-batch projection."""
    import unicodedata

    import pyarrow as pa

    def norm(batch: pa.Table) -> pa.Table:
        out = [
            _WS_RUN.sub(" ", unicodedata.normalize("NFC", t)).strip(" ")
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(norm, batch_format="pyarrow")


def collocations(
    ds: rd.Dataset,
    text_col: str = "text",
    theta_num: int = 5,
    theta_den: int = 4,
    min_count: int = 2,
) -> rd.Dataset:
    """PMI-style collocation mining with an EXACT integer gate.

    Emits word pairs whose observed bigram count exceeds the
    independence expectation by the rational factor
    ``theta_num/theta_den``:

        theta_den * c(w1,w2) * N  >  theta_num * c(w1) * c(w2)

    — the PMI > log(theta) test cleared of floats entirely (cross-
    multiplied int64 both here and in the DuckDB oracle, so the gate
    is bit-exact). N is the total number of within-document bigram
    windows.

    Plan shape: bigram and unigram streams collapse to count residues
    inside ``map_batches`` (corpus never shuffles); the bigram residue
    table is materialized ONCE (bounded by distinct bigrams — Heaps'
    law sublinear; at extreme scale pre-filter with the CMS
    heavy-hitter pass) to serve both the N total and the candidate
    rows; candidates with ``c >= min_count`` join the unigram counts
    through the task-based bucketed hash join (two joins — the native
    pool-based join deadlocks when chained on small clusters).

    → (w1, w2, cxy, cx, cy) for passing pairs.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    def explode_count(n: int, name: str):
        def _f(batch: pa.Table) -> pa.Table:
            grams, _ = arrow_word_ngrams(batch.column(text_col), n)
            vc = pc.value_counts(grams)
            return pa.table(
                {name: vc.field("values"),
                 f"c_{name}": pc.cast(vc.field("counts"), pa.int64())}
            )
        return _f

    def sum_part(name: str):
        def _s(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(name, sort=False, as_index=False)[f"c_{name}"].sum()
        return _s

    from vlm_ocr_doc_reader_ray.state.pin import pin

    bigrams = pin(
        partitioned_apply(
            ds.map_batches(explode_count(2, "ngram"), batch_format="pyarrow"),
            ["ngram"],
            sum_part("ngram"),
        ),
        label="colloc_bigrams",
    )  # distinct-bigram residue (vocab², unbounded at crawl scale);
    # two consumers (n_total sum + candidate split) → disk by default
    n_total = int(bigrams.sum("c_ngram") or 0)

    unigrams = partitioned_apply(
        ds.map_batches(explode_count(1, "w"), batch_format="pyarrow"),
        ["w"],
        sum_part("w"),
    )

    def split_candidates(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch.column("c_ngram"), min_count))
        parts = pc.split_pattern(keep.column("ngram"), " ", max_splits=1)
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "cxy": keep.column("c_ngram"),
            }
        )

    cand = bigrams.map_batches(split_candidates, batch_format="pyarrow")

    u1 = unigrams.map_batches(
        lambda b: pa.table({"w1": b.column("w"), "cx": b.column("c_w")}),
        batch_format="pyarrow",
    )
    u2 = unigrams.map_batches(
        lambda b: pa.table({"w2": b.column("w"), "cy": b.column("c_w")}),
        batch_format="pyarrow",
    )
    j1 = partitioned_hash_join(cand, u1, "w1", "w1", num_buckets=8)
    j2 = partitioned_hash_join(j1, u2, "w2", "w2", num_buckets=8)

    def gate(batch: pa.Table) -> pa.Table:
        # multiply_checked: cxy*N can exceed int64 at corpus scale —
        # fail loudly (as DuckDB does) instead of wrapping the gate
        lhs = pc.multiply_checked(
            pc.multiply_checked(batch.column("cxy"), pa.scalar(theta_den, pa.int64())),
            pa.scalar(n_total, pa.int64()),
        )
        rhs = pc.multiply_checked(
            pc.multiply_checked(batch.column("cx"), batch.column("cy")),
            pa.scalar(theta_num, pa.int64()),
        )
        out = batch.filter(pc.greater(lhs, rhs))
        return out.select(["w1", "w2", "cxy", "cx", "cy"])

    return j2.map_batches(gate, batch_format="pyarrow")


def source_dup_profile(
    docs: rd.Dataset,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    hashed: bool = False,
) -> rd.Dataset:
    """Per-group duplication profile — which crawls/sources carry the
    duplicated material (the triage view that decides where a dedup
    pass pays for itself): run :func:`span_dedup`, re-attach each
    doc's group, and aggregate. → ``(group_col, n_docs, tok_kept,
    tok_dropped)``.

    Composition shape: span_dedup's streaming output joins the
    ``(id, group)`` projection on ONE co-partitioned hash join (the
    group column never rides through the gram shuffle), then
    :func:`...aggregates.grouped_sums` collapses per-batch residues
    before the final tiny group shuffle. The join here is the
    TASK-based :func:`...relational.partitioned_hash_join`, not the
    native one — span_dedup already runs one native join, and two
    HashShuffleAggregator actor pools in one pipeline deadlock small
    clusters (the repo's measured 4-CPU starvation trap). DuckDB
    mirror: SOURCE_DUP_PROFILE_SQL (SPAN_DEDUP_SQL as a derived
    table)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    sd = span_dedup(
        docs.select_columns([id_col, text_col]),
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_count=min_count,
        hashed=hashed,
    )

    def side_proj(batch: pd.DataFrame) -> pd.DataFrame:
        _silence_size_warnings()
        return pd.DataFrame(
            {"__sid": batch[id_col], group_col: batch[group_col]}
        )

    side = docs.select_columns([id_col, group_col]).map_batches(
        side_proj, batch_format="pandas"
    )
    joined = partitioned_hash_join(sd, side, id_col, "__sid")

    def residue(batch: pd.DataFrame) -> pd.DataFrame:
        _silence_size_warnings()
        return pd.DataFrame(
            {
                group_col: batch[group_col],
                "tok_kept": batch["n_kept"].astype("int64"),
                "tok_dropped": batch["n_dropped"].astype("int64"),
            }
        )

    return grouped_sums(
        joined.map_batches(residue, batch_format="pandas"),
        group_col,
        ["tok_kept", "tok_dropped"],
        count_alias="n_docs",
    )
