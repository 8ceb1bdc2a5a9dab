"""Text analysis: language-ID, quality scoring, token counting,
document fingerprinting.

All formulas are deliberately SQL-expressible (single IEEE divisions,
regexp counts, sha256-based min-fingerprints) so the driver's DuckDB
oracle can verify them bit-for-bit — see
``corpus/sqlmirror.py::TEXT_ANALYSIS_SQL`` fragments.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray
import ray.data as rd

# language marker words, matched against whitespace tokens. Order of
# _LANGS is the deterministic tie-break (first max wins).
_LANGS = ["de", "en", "es", "fr", "zh"]
_MARKERS = {
    "de": ("der", "die", "und", "nicht", "das"),
    "en": ("the", "and", "of", "a", "to"),
    "es": ("el", "los", "y", "que", "de"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized placeholders
}

_STOPWORDS = frozenset(
    "the a an and or of to in on for with at by from is are was were be been".split()
)
# ASCII-EXPLICIT character classes, identical in Python re and in the
# DuckDB (RE2) oracle — never \w/\s shorthands, whose ASCII/Unicode
# semantics differ between engines. Lockstep partner:
# corpus/sqlmirror.py::TEXT_ANALYSIS_SQL.
_PUNCT_RX = re.compile(r"[^0-9A-Za-z_ \t\n\r\f\v]")
_BPE_RX = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]")


class TextAnalyzer:
    """Actor-pool kernel: one pass per batch computing all features.

    Stateful setup (compiled regexes, marker tables) happens once per
    actor; ``__call__`` is a vectorized-at-batch-level pure function.
    """

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.punct_rx = _PUNCT_RX
        self.bpe_rx = _BPE_RX

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs, nw, nc, stopr, punct, ws_tokens, bpe_tokens, fps = (
            [], [], [], [], [], [], [], []
        )
        for t in texts:
            # split(' ') — NOT split() — mirrors string_split(text, ' ')
            # bit-for-bit on multi-space / newline / empty input
            words = t.split(" ")
            n = len(words)
            nw.append(n)
            nc.append(len(t))
            # language id: marker hit counts, tie -> first lang in _LANGS
            best_lang, best_score = "und", 0
            for lang in _LANGS:
                score = sum(1 for w in words if w in _MARKERS[lang])
                if score > best_score:
                    best_lang, best_score = lang, score
            langs.append(best_lang)
            stopr.append(
                (sum(1 for w in words if w in _STOPWORDS) / n) if n else 0.0
            )
            punct.append(len(self.punct_rx.findall(t)))
            ws_tokens.append(n)
            bpe_tokens.append(len(self.bpe_rx.findall(t)))
            fps.append(fingerprint(t))

        return pa.table(
            {
                **{name: batch.column(name) for name in batch.column_names},
                "lang_pred": pa.array(langs, type=pa.string()),
                "n_words": pa.array(nw, type=pa.int64()),
                "n_chars_measured": pa.array(nc, type=pa.int64()),
                "stopword_ratio": pa.array(stopr, type=pa.float64()),
                "n_punct": pa.array(punct, type=pa.int64()),
                "ws_tokens": pa.array(ws_tokens, type=pa.int64()),
                "bpe_tokens": pa.array(bpe_tokens, type=pa.int64()),
                "fingerprint": pa.array(fps, type=pa.string()),
            }
        )


def fingerprint(text: str, n: int = 3) -> str:
    """Winnowing-style doc fingerprint: min over word-``n``-gram sha256
    prefixes (16 hex chars). Stable across processes and mirrored by
    ``min(substr(sha256(...),1,16))`` in SQL; word split is
    ``split(' ')`` and short texts hash as-is (== the SQL
    ``CASE WHEN nw < 3 THEN [text]`` branch, including empty text)."""
    words = text.split(" ")
    if len(words) < n:
        grams = [text]
    else:
        grams = [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]
    return min(hashlib.sha256(g.encode("utf-8")).hexdigest()[:16] for g in grams)


def quality_filter(
    ds: rd.Dataset,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_ratio: float = 0.01,
    lean: bool = False,
) -> rd.Dataset:
    """Gopher-style heuristic quality gate for a training corpus:
    keep a document iff word count, mean word length, symbol ratio
    and stopword ratio are all inside the configured bands (the
    rule family of Rae et al. 2021 §A1.1, reimplemented over this
    engine's SQL-lockstep token definitions).

    Adds the measured features AND a ``quality_pass`` flag rather
    than silently dropping rows — a corpus pipeline wants the reject
    stream (flag false) as much as the keep stream; filter on the
    flag downstream. Pure per-batch projection: no shuffle.

    ``lean=True`` computes ONLY the four gate inputs (word count,
    chars, punct count, stopword ratio) instead of the full
    TextAnalyzer pass — same formulas verbatim (differential test
    pins flag equality), ~3× cheaper when the caller (``doc_tiers``)
    never reads lang_pred/fingerprint/bpe_tokens."""
    if lean:

        def lean_features(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            nw, nc, punct, stopr = [], [], [], []
            for t in texts:
                words = t.split(" ")
                n = len(words)
                nw.append(n)
                nc.append(len(t))
                punct.append(len(_PUNCT_RX.findall(t)))
                stopr.append(
                    (sum(1 for w in words if w in _STOPWORDS) / n)
                    if n else 0.0
                )
            return pa.table(
                {
                    **{name: batch.column(name) for name in batch.column_names},
                    "n_words": pa.array(nw, type=pa.int64()),
                    "n_chars_measured": pa.array(nc, type=pa.int64()),
                    "stopword_ratio": pa.array(stopr, type=pa.float64()),
                    "n_punct": pa.array(punct, type=pa.int64()),
                }
            )

        analyzed = ds.map_batches(lean_features, batch_format="pyarrow")
    else:
        analyzed = analyze(ds, text_col=text_col)

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nw = batch.column("n_words")
        nchars = batch.column("n_chars_measured")
        npunct = batch.column("n_punct")
        stopr = batch.column("stopword_ratio")
        # mean word length over split(' ') tokens: (chars - separators) / words
        mean_wl = pc.divide(
            pc.cast(pc.subtract(nchars, pc.subtract(nw, 1)), pa.float64()),
            pc.cast(nw, pa.float64()),
        )
        symbol_ratio = pc.divide(
            pc.cast(npunct, pa.float64()), pc.cast(pc.max_element_wise(nchars, 1), pa.float64())
        )
        ok = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(nw, min_words), pc.less_equal(nw, max_words)),
                pc.and_(
                    pc.greater_equal(mean_wl, min_mean_word_len),
                    pc.less_equal(mean_wl, max_mean_word_len),
                ),
            ),
            pc.and_(
                pc.less_equal(symbol_ratio, max_symbol_ratio),
                pc.greater_equal(stopr, min_stopword_ratio),
            ),
        )
        return (
            batch.append_column("mean_word_len", mean_wl)
            .append_column("symbol_ratio", symbol_ratio)
            .append_column("quality_pass", ok)
        )

    return analyzed.map_batches(flag, batch_format="pyarrow")


def hash_sample(
    ds: rd.Dataset, key_col: str, rate: float, seed: str = "sample"
) -> rd.Dataset:
    """Deterministic corpus sampling: keep a row iff
    ``md5(seed:key) mod 1e6 < rate*1e6``.

    The right way to sample at 10^12 docs: no RNG state, no pass
    counting — membership is a pure function of the key, so the
    sample is IDENTICAL at any parallelism, any partitioning, any
    re-run, and composable (a 1% sample of a 10% sample is the
    0.1% sample you'd expect only if seeds differ — use distinct
    seeds per stage). Mirrored bit-for-bit by the DuckDB oracle
    (md5-based threshold)."""
    import hashlib

    threshold = int(rate * 1_000_000)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        mask = pa.array(
            [
                int(
                    hashlib.md5(f"{seed}:{k}".encode("utf-8")).hexdigest()[:8], 16
                ) % 1_000_000
                < threshold
                for k in keys
            ],
            type=pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def salient_terms(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Per-document salient term: the word with the highest term
    frequency, tie-broken toward the RAREST word corpus-wide (lowest
    document frequency), then lexicographically.

    The tf-idf keyword-extraction shape with a pure-integer total
    order — ``(tf desc, df asc, word asc)`` ranks like
    ``tf·log(N/df)`` at equal tf but stays bit-exact against the SQL
    mirror (no float log). Fully distributed: per-batch vectorized
    (doc, word, tf) explode (each doc lives in one row, so per-batch
    tf is exact), document frequencies via pre-aggregated residues,
    one bucketed hash join tf⋈df on the word, and a hash-partitioned
    vectorized argmax per document. Output:
    ``(id_col, term, tf, df)``."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join
    from vlm_ocr_doc_reader_ray.stages.scrub import _batch_word_ngrams

    def explode_tf(batch: pd.DataFrame) -> pd.DataFrame:
        words, doc_idx = _batch_word_ngrams(batch[text_col], 1)
        if len(words) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "word": pd.Series([], dtype="object"),
                 "tf": pd.Series([], dtype="int64")}
            )
        tmp = pd.DataFrame({"di": doc_idx, "word": words})
        counts = tmp.groupby(["di", "word"], sort=False).size()
        di = counts.index.get_level_values(0).to_numpy()
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[di],
                "word": counts.index.get_level_values(1).to_numpy(),
                "tf": counts.to_numpy().astype("int64"),
            }
        )

    tf = ds.map_batches(explode_tf, batch_format="pandas")

    # document frequency: tf rows ARE the distinct (doc, word) pairs,
    # so per-batch word counts over them are exact partial df residues
    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["word"].value_counts()
        return pd.DataFrame(
            {"word": c.index.to_numpy(), "df": c.to_numpy().astype("int64")}
        )

    df_tbl = grouped_sums(
        tf.map_batches(df_partial, batch_format="pandas"), ["word"], ["df"]
    )

    joined = partitioned_hash_join(tf, df_tbl, "word", "word")

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [id_col, "tf", "df", "word"],
            ascending=[True, False, True, True],
        ).drop_duplicates(id_col, keep="first")
        return pd.DataFrame(
            {
                id_col: g[id_col].astype("int64").to_numpy(),
                "term": g["word"].to_numpy(),
                "tf": g["tf"].astype("int64").to_numpy(),
                "df": g["df"].astype("int64").to_numpy(),
            }
        )

    return partitioned_apply(joined, [id_col], argmax)


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    strata_col: str,
    rates: dict,
    default_rate: float = 0.0,
    seed: str = "strata",
) -> rd.Dataset:
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(seed:key) mod 1e6 < rate(stratum)*1e6``.

    The language/domain-rebalancing op of a pre-training mix: each
    stratum (e.g. ``lang``) gets its own keep rate, membership stays a
    pure function of the key (same md5 threshold as
    :func:`hash_sample`, so identical at any parallelism/partitioning
    and composable across stages via distinct seeds). ``rates`` maps
    stratum value → rate; strata not listed use ``default_rate``. The
    rate table is a handful of entries shipped inside the task
    closure — never a shuffle."""
    import hashlib

    import pandas as pd

    thresholds = {k: int(v * 1_000_000) for k, v in rates.items()}
    default_threshold = int(default_rate * 1_000_000)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.Series(
            [
                int(
                    hashlib.md5(f"{seed}:{k}".encode("utf-8")).hexdigest()[:8], 16
                ) % 1_000_000
                for k in batch[key_col]
            ],
            index=batch.index,
        )
        cut = (
            batch[strata_col]
            .map(thresholds)
            .fillna(default_threshold)
            .astype("int64")
        )
        return batch[h < cut]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_top_k(
    ds: rd.Dataset,
    key_col: str,
    strata_col: str,
    k: int,
    seed: str = "stratak",
) -> rd.Dataset:
    """Exactly ``min(k, stratum size)`` rows per stratum, chosen by
    md5 order of the key — the fixed-BUDGET companion to
    :func:`stratified_sample`'s fixed-RATE sampling (e.g. "200k docs
    per language for the eval slice").

    Deterministic: the md5 hex string gives a uniform, key-pure total
    order (ties broken by the key itself), so the selected set is
    identical at any parallelism and stable under corpus growth
    EXCEPT at the boundary (a new doc hashing into the top k evicts
    exactly one). One hash shuffle by stratum, then a vectorized
    sort+head per partition; per-batch local top-k first, so at most
    ``k × blocks`` rows per stratum ever shuffle."""
    import hashlib

    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def ranked(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__rk"] = [
            hashlib.md5(f"{seed}:{v}".encode("utf-8")).hexdigest()
            for v in batch[key_col]
        ]
        # local combiner: only each batch's per-stratum top k survive
        return (
            batch.sort_values(["__rk", key_col])
            .groupby(strata_col, sort=False, group_keys=False)
            .head(k)
        )

    local = ds.map_batches(ranked, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.sort_values(["__rk", key_col])
            .groupby(strata_col, sort=False, group_keys=False)
            .head(k)
        )
        return out.drop(columns="__rk")

    return partitioned_apply(local, [strata_col], merge)


def grouped_token_cap(
    ds: rd.Dataset,
    group_col: str,
    key_col: str,
    len_col: str,
    budget: int,
    seed: str = "hostcap",
    budgets: "dict | None" = None,
) -> rd.Dataset:
    """Per-group token budget — the RefinedWeb/Gopher-style domain
    cap ("no group contributes more than B tokens").

    Each group keeps whole documents in deterministic md5-of-key order
    while the inclusive running token total stays ≤ ``budget``; the
    first document that would cross the cap — and everything ranked
    after it — drops. Exact integers throughout, so the SQL mirror
    (a windowed running sum) is bit-exact, and the kept set is
    identical at any parallelism.

    Local combiner: each batch forwards its group-local EXCLUSIVE
    budget prefix — the docs whose cumsum before themselves is ≤
    budget, i.e. the local kept-prefix PLUS the first locally-crossing
    doc. Forwarding the crossing doc is what makes the prune sound:
    every doc ranked before the GLOBAL crossing is locally kept (its
    local cumsum ≤ its global cumsum ≤ budget), and the global
    crossing doc is either locally kept or its batch's first crossing
    — so the final pass always sees exact cumsums up to and including
    the global crossing, and everything after it drops. A prune that
    forwarded only the inclusive prefix would let a later short doc
    sneak under a cumsum missing the dropped doc's length. The
    shuffle moves O(budget/avg_len + 1) rows per group per block,
    never the corpus.

    ``budgets`` optionally overrides the budget PER GROUP (group
    value → budget; groups absent from the dict fall back to
    ``budget``) — the tier-mixture provisioning path
    (:func:`pipelines.curation.tiered_token_budget`).

    → input rows kept, original columns.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    if budget < 0:
        raise ValueError("budget must be non-negative")
    if budgets and any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be non-negative")

    def _budget_of(groups) -> "np.ndarray":
        if not budgets:
            return np.full(len(groups), budget, dtype=np.int64)
        return np.fromiter(
            (budgets.get(g, budget) for g in groups),
            dtype=np.int64, count=len(groups),
        )

    def prefix(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__rk"] = [
            hashlib.md5(f"{seed}:{v}".encode("utf-8")).hexdigest()
            for v in batch[key_col]
        ]
        batch = batch.sort_values(["__rk", key_col])
        cum = batch.groupby(group_col, sort=False)[len_col].cumsum()
        excl = np.asarray(cum) - np.asarray(batch[len_col])
        return batch[excl <= _budget_of(batch[group_col].tolist())]

    local = ds.map_batches(prefix, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__rk", key_col])
        cum = g.groupby(group_col, sort=False)[len_col].cumsum()
        keep = np.asarray(cum) <= _budget_of(g[group_col].tolist())
        return g[keep].drop(columns="__rk")

    return partitioned_apply(local, [group_col], final)


def analyze(ds: rd.Dataset, text_col: str = "text", concurrency: int | None = None) -> rd.Dataset:
    kwargs = dict(batch_format="pyarrow", batch_size=1024)
    if concurrency is None:
        return ds.map_batches(TextAnalyzer(text_col), **kwargs)
    return ds.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs=dict(text_col=text_col),
        concurrency=concurrency,
        **kwargs,
    )


def pack_sequences(
    ds: rd.Dataset,
    key_col: str,
    len_col: str,
    seq_len: int,
    seed: str = "pack",
) -> rd.Dataset:
    """Concat-and-chunk sequence packing: lay every document's tokens
    end-to-end in deterministic md5-of-key order and cut the stream
    into fixed ``seq_len`` windows — the GPT-style packing pass that
    turns a deduped corpus into training sequences with zero padding.

    Emits one row per (document, sequence) overlap segment:
    ``(key, seq_id, off_in_seq, off_in_doc, n_tokens)`` — enough for a
    loader to assemble any sequence from its source docs (and for
    attribution the other way). A document longer than ``seq_len``
    spans several rows; sequence boundaries never shift with
    parallelism because the layout is a pure function of the keys
    (md5 order + exact global prefix sums via
    :func:`~vlm_ocr_doc_reader_ray.stages.relational.global_ordered_prefix_sum`).
    Rows with a non-positive token count are dropped.

    The explode is vectorized (``np.repeat`` over per-doc span
    counts); nothing materializes beyond the 256-bucket residue pass
    inside the prefix sum."""
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.relational import (
        global_ordered_prefix_sum,
    )

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")

    started = global_ordered_prefix_sum(
        ds, key_col, val_col=len_col, seed=seed, out_col="__start"
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        nw_all = batch[len_col].to_numpy(dtype="int64")
        keep = nw_all > 0
        start = batch["__start"].to_numpy(dtype="int64")[keep]
        nw = nw_all[keep]
        keys = batch.loc[keep, key_col].to_numpy()
        first = start // seq_len
        last = (start + nw - 1) // seq_len
        spans = last - first + 1
        idx = np.repeat(np.arange(len(nw), dtype=np.int64), spans)
        span_starts = np.concatenate(([0], np.cumsum(spans)[:-1]))
        pos = np.arange(len(idx), dtype=np.int64) - span_starts[idx]
        seq_id = first[idx] + pos
        seg_lo = np.maximum(start[idx], seq_id * seq_len)
        seg_hi = np.minimum(start[idx] + nw[idx], (seq_id + 1) * seq_len)
        return pd.DataFrame(
            {
                key_col: keys[idx],
                "seq_id": seq_id,
                "off_in_seq": seg_lo - seq_id * seq_len,
                "off_in_doc": seg_lo - start[idx],
                "n_tokens": seg_hi - seg_lo,
            }
        )

    return started.map_batches(explode, batch_format="pandas")


def mixture_rebalance(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    weights: dict,
    seed: str = "mix",
) -> rd.Dataset:
    """Deterministic data-mixing: replicate each row ``w`` times where
    ``w`` is its group's target weight — the temperature-sampling /
    language-rebalancing pass of an LM data pipeline (upsample rare
    languages, downsample the head) without any RNG state.

    A row with weight ``w`` gets ``floor(w)`` copies plus one more iff
    ``md5(seed:key) mod 1e6 < round(frac(w)*1e6)`` — the same
    md5-threshold membership rule as :func:`hash_sample`, so the
    expansion is a pure function of the keys: identical at any
    parallelism, composable, and exactly SQL-mirrorable. Weights
    absent from the dict default to 1.0 (pass-through). Adds ``rep``
    (0-based copy index). Pure per-batch flat-map — no shuffle; the
    expansion is vectorized (``np.repeat``)."""
    import hashlib

    import numpy as np
    import pandas as pd

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        w = (
            batch[group_col]
            .map(weights)
            .fillna(1.0)
            .to_numpy(dtype="float64")
        )
        base = np.floor(w).astype("int64")
        thresh = np.floor((w - base) * 1_000_000 + 0.5).astype("int64")
        u = np.array(
            [
                int(hashlib.md5(f"{seed}:{k}".encode("utf-8")).hexdigest()[:8], 16)
                % 1_000_000
                for k in batch[key_col]
            ],
            dtype="int64",
        )
        reps = base + (u < thresh)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        out = batch.iloc[idx].reset_index(drop=True)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        out["rep"] = np.arange(len(idx), dtype="int64") - np.repeat(starts, reps)
        return out

    return ds.map_batches(expand, batch_format="pandas")


def token_budget_head(
    ds: rd.Dataset,
    key_col: str,
    len_col: str,
    budget: int,
    seed: str = "shuffle",
) -> rd.Dataset:
    """Cut the corpus at exactly ``budget`` tokens in deterministic
    md5-of-key shuffle order — "give me the first N tokens of the
    (shuffled) corpus" as a distributed filter, not a driver scan.

    Each doc's global token offset comes from the distributed prefix
    sum; docs starting past the budget drop, the straddling doc is
    truncated (``truncated`` flag, ``n_tokens`` = kept tokens), and
    the kept token counts sum to ``min(budget, corpus_tokens)``
    exactly. Layout is a pure function of the keys — the head is the
    same corpus prefix :func:`pack_sequences` would pack first under
    the same seed."""
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.relational import (
        global_ordered_prefix_sum,
    )

    if budget < 0:
        raise ValueError("budget must be >= 0")

    started = global_ordered_prefix_sum(
        ds, key_col, val_col=len_col, seed=seed, out_col="__start"
    )

    def head(batch: pd.DataFrame) -> pd.DataFrame:
        start = batch["__start"].to_numpy(dtype="int64")
        nw = batch[len_col].to_numpy(dtype="int64")
        keep = (start < budget) & (nw > 0)
        out = batch.loc[keep].reset_index(drop=True)
        kept = np.minimum(nw[keep], budget - start[keep])
        out["n_tokens"] = kept
        out["truncated"] = kept < nw[keep]
        return out.drop(columns=["__start"])

    return started.map_batches(head, batch_format="pandas")


def term_postings(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> rd.Dataset:
    """Inverted index: globally-distinct ``(term, doc)`` postings with
    each term's document frequency attached — the build step for
    keyword search / decontamination lookups over the corpus.

    Per-batch Arrow explode + LOCAL distinct collapses every batch to
    its unique (term, doc) pairs before anything moves; one
    hash-partition by term then finishes the global distinct AND the
    df count in the same vectorized pass (the partition holds every
    occurrence of its terms, so df is exact partition-locally — no
    second shuffle, no join). ``min_df`` prunes hapax noise at the
    source. Output: ``(term, id_col, df)``, naturally partitioned by
    term — ready to write partitioned-by-term-hash for point
    lookups."""
    import pandas as pd
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.scrub import arrow_word_ngrams

    def explode(batch: pa.Table) -> pd.DataFrame:
        grams, doc_idx = arrow_word_ngrams(batch.column(text_col), 1)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[doc_idx]
        df = pd.DataFrame({"term": grams.to_pandas(), id_col: ids})
        return df.drop_duplicates(ignore_index=True)

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates(ignore_index=True)
        part["df"] = part.groupby("term", sort=False)["term"].transform("size").astype("int64")
        return part[part["df"] >= min_df].reset_index(drop=True)

    return partitioned_apply(pairs, ["term"], finish)


def keyword_search(
    ds: rd.Dataset,
    queries: "dict[int, list[str]]",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Literal-keyword retrieval: for each query (a bag of terms),
    the top-``k`` documents by total term-occurrence count, ties
    broken by ``doc_id``. → ``(query_id, doc_id, score, rank)``,
    ``score`` = summed occurrences of the query's terms, integer.

    Reference analog: none — beyond-reference retrieval op; the
    integer-score baseline under a BM25-style ranker (whose idf/len
    normalization is a per-doc float on top of exactly these counts).

    The query set is broadcast in the batch-fn closure (tiny — this
    is the "small side never ships per row" rule); each batch scores
    its docs vectorized (``Series.isin`` over the flattened word
    array + ``bincount`` per query) and keeps only its local top-k
    per query, so at most ``k × blocks`` rows per query ever shuffle.
    One residue hash-partition by query then merges the partials —
    the :func:`stratified_top_k` shape."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    _empty = {
        "query_id": pd.Series([], dtype="int64"),
        id_col: pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="int64"),
    }

    def local(batch: pa.Table) -> pd.DataFrame:
        words = pc.split_pattern(batch.column(text_col), " ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        if len(lens) == 0:
            return pd.DataFrame(_empty)
        flat = pd.Series(pc.list_flatten(words).to_pandas(), dtype="object")
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        parts = []
        for qid, terms in queries.items():
            mask = flat.isin(terms).to_numpy()
            if not mask.any():
                continue
            counts = np.bincount(doc_idx[mask], minlength=len(lens))
            nz = np.nonzero(counts)[0]
            part = pd.DataFrame(
                {
                    "query_id": np.full(len(nz), qid, dtype=np.int64),
                    id_col: ids[nz].astype(np.int64),
                    "score": counts[nz].astype(np.int64),
                }
            )
            parts.append(
                part.sort_values(
                    ["score", id_col], ascending=[False, True]
                ).head(k)
            )
        if not parts:
            return pd.DataFrame(_empty)
        return pd.concat(parts, ignore_index=True)

    local_ds = ds.select_columns([id_col, text_col]).map_batches(
        local, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False, group_keys=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (
            g.groupby("query_id", sort=False).cumcount() + 1
        ).astype("int64")
        return g

    return partitioned_apply(local_ds, ["query_id"], merge)


def phrase_search(
    ds: rd.Dataset,
    phrases: "dict[int, str]",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact-phrase retrieval: for each query phrase (a literal word
    sequence), the top-``k`` documents by occurrence count of that
    exact sequence, ties by ``doc_id``. → ``(query_id, doc_id, score,
    rank)`` — the positional companion to :func:`keyword_search`
    (bag-of-terms scoring cannot express adjacency).

    Reference analog: none — beyond-reference retrieval op.

    One Arrow n-gram pass per DISTINCT phrase length per batch (the
    same shifted-join builder as the census), equality against the
    broadcast phrase, ``bincount`` per doc, local top-k per batch —
    only ``k × blocks`` rows per query ever shuffle; one residue
    hash-partition merges. DuckDB mirror: PHRASE_SEARCH_SQL (per-
    length gram explodes UNION'd)."""
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.scrub import arrow_word_ngrams

    by_len: dict[int, list] = {}
    for qid, phrase in phrases.items():
        by_len.setdefault(len(phrase.split(" ")), []).append((qid, phrase))

    _empty = {
        "query_id": pd.Series([], dtype="int64"),
        id_col: pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="int64"),
    }

    def local(batch: pa.Table) -> pd.DataFrame:
        nb = len(batch)
        if nb == 0:
            return pd.DataFrame(_empty)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        parts = []
        for length, plist in by_len.items():
            grams, doc_idx = arrow_word_ngrams(batch.column(text_col), length)
            s = pd.Series(grams.to_pandas(), dtype="object")
            for qid, phrase in plist:
                mask = (s == phrase).to_numpy()
                if not mask.any():
                    continue
                counts = np.bincount(doc_idx[mask], minlength=nb)
                nz = np.nonzero(counts)[0]
                part = pd.DataFrame(
                    {
                        "query_id": np.full(len(nz), qid, dtype=np.int64),
                        id_col: ids[nz].astype(np.int64),
                        "score": counts[nz].astype(np.int64),
                    }
                )
                parts.append(
                    part.sort_values(
                        ["score", id_col], ascending=[False, True]
                    ).head(k)
                )
        if not parts:
            return pd.DataFrame(_empty)
        return pd.concat(parts, ignore_index=True)

    local_ds = ds.select_columns([id_col, text_col]).map_batches(
        local, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False, group_keys=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (
            g.groupby("query_id", sort=False).cumcount() + 1
        ).astype("int64")
        return g

    return partitioned_apply(local_ds, ["query_id"], merge)


def word_count_table(batch: pa.Table, keep_cols, text_col: str = "text",
                     out_col: str = "nw") -> pa.Table:
    """The engine-wide word-count projection — ``split(' ')`` length
    as int64, matching DuckDB ``len(string_split(text, ' '))``
    bit-for-bit. ONE definition so every consumer (quantiles, packing,
    token budget, bench) tokenizes identically to the SQL mirrors."""
    import pyarrow.compute as pc

    words = pc.split_pattern(batch.column(text_col), " ")
    cols = {c: batch.column(c) for c in keep_cols}
    cols[out_col] = pc.cast(pc.list_value_length(words), pa.int64())
    return pa.table(cols)


def word_freq_score(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_vocab: int | None = None,
) -> rd.Dataset:
    """CCNet-shape fluency scoring with an exactly-verifiable
    statistic: each document's mean corpus frequency of its words
    (gibberish and boilerplate-free rare-token soup score LOW, fluent
    common prose scores HIGH — the same ordering an LM-perplexity
    filter produces, but integer-exact up to one final division, so
    the DuckDB oracle can gate it bit-for-bit).

    Pass 1: global word counts via per-batch Arrow ``value_counts``
    residues + pre-aggregated sum (bounded by vocabulary).
    ``top_vocab`` caps the broadcast table to the most frequent words
    (ties → lexicographic) when the vocabulary itself is too big to
    ship — out-of-table words then contribute frequency 0, which only
    sharpens the filter. Pass 2 broadcasts the table once (``ray.put``)
    and scores per batch with a vectorized map + ``bincount``.
    Output: ``(id, nw, freq_sum, mean_freq)``."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    def count_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        vc = pc.value_counts(flat)
        return pa.table(
            {"w": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = grouped_sums(
        ds.select_columns([text_col]).map_batches(
            count_partial, batch_format="pyarrow"
        ),
        ["w"], ["n"],
    ).to_pandas()
    if counts.empty:  # empty input loses the groupby schema
        counts = pd.DataFrame({"w": pd.Series([], dtype="object"),
                               "n": pd.Series([], dtype="int64")})
    if top_vocab is not None and len(counts) > top_vocab:
        counts = counts.sort_values(
            ["n", "w"], ascending=[False, True], ignore_index=True
        ).head(top_vocab)
    table_ref = ray.put(dict(zip(counts["w"], counts["n"].astype("int64"))))

    def score(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column(text_col), " ")
        nw = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words).to_pandas()
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), nw)
        freqs = flat.map(ray.get(table_ref)).fillna(0).to_numpy(dtype="int64")
        fsum = np.bincount(doc_idx, weights=freqs, minlength=len(batch)).astype(
            np.int64
        )
        return pa.table(
            {id_col: batch.column(id_col),
             "nw": pa.array(nw),
             "freq_sum": pa.array(fsum),
             "mean_freq": pa.array(fsum.astype(np.float64) / nw)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# DSIR-flavored importance weighting (hashed n-gram importance sampling)
# --------------------------------------------------------------------------

def _md5_u64(s: str) -> int:
    """First 8 bytes of md5, big-endian (the dedup-family hash
    contract, duplicated here so worker-side closures have no
    package-level import): mirrored in SQL by
    ``('0x' || substr(md5(w), 1, 16))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _hashed_word_buckets(texts, n_buckets: int) -> tuple:
    """Per-row hashed-unigram bucket lists: returns (flat_buckets,
    row_lengths). md5_u64 per UNIQUE word per batch (not per
    occurrence), inverse-mapped — the hash loop is bounded by batch
    vocabulary, not token count."""
    import numpy as np

    words_per_row = [t.split(" ") for t in texts]
    lens = np.fromiter((len(w) for w in words_per_row), dtype=np.int64,
                       count=len(words_per_row))
    flat = [w for row in words_per_row for w in row]
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    uh = np.fromiter(
        (_md5_u64(w) % n_buckets for w in uniq), dtype=np.int64, count=len(uniq)
    )
    return uh[inv], lens


def importance_count_tables(
    ds: rd.Dataset,
    target_filter,
    text_col: str = "text",
    n_buckets: int = 65536,
) -> tuple:
    """ONE streaming pass building both hashed-unigram count tables of
    DSIR-style importance sampling: ``target`` (rows passing
    ``target_filter(batch) -> bool mask``) and ``source`` (all rows).
    Each batch collapses to ≤ 2 × n_buckets residue rows; the global
    combine is a pre-aggregated sum; the result is two bounded int64
    arrays ready to broadcast."""
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="int64"),
                 "tc": pd.Series([], dtype="int64"),
                 "sc": pd.Series([], dtype="int64")}
            )
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), n_buckets)
        mask = np.asarray(target_filter(batch), dtype=bool)
        row_of = np.repeat(np.arange(len(batch)), lens)
        sc = np.bincount(buckets, minlength=n_buckets)
        tc = np.bincount(buckets[mask[row_of]], minlength=n_buckets)
        live = (sc > 0) | (tc > 0)
        h = np.nonzero(live)[0]
        return pd.DataFrame(
            {"h": h.astype(np.int64), "tc": tc[h].astype(np.int64),
             "sc": sc[h].astype(np.int64)}
        )

    residues = ds.map_batches(partial, batch_format="pandas")
    totals = grouped_sums(residues, ["h"], ["tc", "sc"]).to_pandas()
    t = np.zeros(n_buckets, dtype=np.int64)
    s = np.zeros(n_buckets, dtype=np.int64)
    t[totals["h"].to_numpy()] = totals["tc"].to_numpy()
    s[totals["h"].to_numpy()] = totals["sc"].to_numpy()
    return t, s


def importance_scores(
    ds: rd.Dataset,
    t_counts: "np.ndarray",
    s_counts: "np.ndarray",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> rd.Dataset:
    """Per-document importance features against broadcast count
    tables: integer-exact ``t_sum`` / ``s_sum`` (sum of target /
    source bucket counts over the doc's token occurrences — hash-gate
    safe at any parallelism), their one-division ``ratio``, and the
    DSIR log-likelihood-ratio ``log_ratio`` with add-``alpha``
    smoothing (float accumulation — pytest-verified, excluded from
    the SQL hash gate because libm/accumulation-order ulps are not
    reproducible across engines)."""
    import numpy as np

    n_buckets = len(s_counts)
    big_t = np.float64(t_counts.sum())
    big_s = np.float64(s_counts.sum())
    logr = np.log((t_counts + alpha) / (big_t + alpha * n_buckets)) - np.log(
        (s_counts + alpha) / (big_s + alpha * n_buckets)
    )
    ref = ray.put((t_counts, s_counts, logr))

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow as pa2

        if len(batch) == 0:
            return pa2.table(
                {id_col: pa2.array([], type=pa2.int64()),
                 "t_sum": pa2.array([], type=pa2.int64()),
                 "s_sum": pa2.array([], type=pa2.int64()),
                 "ratio": pa2.array([], type=pa2.float64()),
                 "log_ratio": pa2.array([], type=pa2.float64())}
            )
        tt, ss, lr = ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        buckets, lens = _hashed_word_buckets(texts, n_buckets)
        row_of = np.repeat(np.arange(len(texts)), lens)
        t_sum = np.bincount(row_of, weights=tt[buckets], minlength=len(texts))
        s_sum = np.bincount(row_of, weights=ss[buckets], minlength=len(texts))
        lsum = np.bincount(row_of, weights=lr[buckets], minlength=len(texts))
        return pa2.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "t_sum": pa2.array(t_sum.astype(np.int64)),
                "s_sum": pa2.array(s_sum.astype(np.int64)),
                "ratio": pa2.array(
                    t_sum.astype(np.float64) / s_sum.astype(np.float64)
                ),
                "log_ratio": pa2.array(lsum.astype(np.float64)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def top_terms_per_group(
    ds: rd.Dataset,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 10,
    checkpoint: bool = False,
) -> rd.Dataset:
    """Top-k terms by occurrence count per group with a pure-integer
    total order (count desc, word asc — no float idf, so the SQL
    mirror is exact). Per-batch vectorized (group, word, count)
    residues bound the shuffle by group × batch-vocabulary; ONE
    hash-partition-by-group shuffle then does the global sum AND the
    top-k head vectorized per partition ((group, word) keys are
    many-distinct, where Ray's native sort-groupby is measured
    pathological — the repo's standing finding). Partitioning
    assumption: one group's vocabulary fits a partition.
    ``checkpoint=True`` pins the word residues first so an expensive
    upstream lineage (e.g. the link-graph tag scan) executes once.
    Output: (group, rank, word, cnt)."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.scrub import _batch_word_ngrams

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words, doc_idx = _batch_word_ngrams(batch[text_col], 1)
        if len(words) == 0:
            return pd.DataFrame(
                {group_col: pd.Series([], dtype="object"),
                 "word": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        tmp = pd.DataFrame(
            {group_col: batch[group_col].to_numpy()[doc_idx], "word": words}
        )
        counts = tmp.groupby([group_col, "word"], sort=False).size()
        return pd.DataFrame(
            {
                group_col: counts.index.get_level_values(0).to_numpy(),
                "word": counts.index.get_level_values(1).to_numpy(),
                "cnt": counts.to_numpy().astype("int64"),
            }
        )

    residues = ds.select_columns([group_col, text_col]).map_batches(
        explode, batch_format="pandas"
    )
    if checkpoint:
        residues = residues.materialize()
        if residues.count() == 0:  # schema-stable empty, not Ray's
            import pyarrow as _pa

            import ray.data as _rd

            return _rd.from_arrow(
                _pa.table(
                    {
                        group_col: _pa.array([], _pa.string()),
                        "rank": _pa.array([], _pa.int64()),
                        "word": _pa.array([], _pa.string()),
                        "cnt": _pa.array([], _pa.int64()),
                    }
                )
            )

    def sum_and_head(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby([group_col, "word"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        g["cnt"] = g["cnt"].astype("int64")
        g = g.sort_values([group_col, "cnt", "word"],
                          ascending=[True, False, True], ignore_index=True)
        g = g.groupby(group_col, sort=False).head(k).copy()
        g["rank"] = (g.groupby(group_col, sort=False).cumcount() + 1).astype("int64")
        return g[[group_col, "rank", "word", "cnt"]]

    return partitioned_apply(residues, [group_col], sum_and_head)


def chunk_windows(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 24,
    stride: int = 16,
) -> rd.Dataset:
    """Sliding-window chunking (RAG / context-window training prep).

    Each document's word sequence (engine-wide ``split(' ')``) becomes
    overlapping chunks of ``window`` words advancing by ``stride``:
    n_chunks = 1 if nw <= window else 1 + ceil((nw-window)/stride)
    (integer formula — ``1 + (nw - window + stride - 1) // stride`` —
    so the DuckDB mirror is bit-exact); chunk *i* covers words
    [i*stride, min(i*stride + window, nw)).

    Fully vectorized flat-map: one ``split_pattern`` per batch, chunk
    membership built with np.repeat/cumsum gather indices over the
    flat word array, chunk text re-joined with the Arrow
    ``binary_join`` C kernel — no Python loop over words. Pure
    per-document projection: no shuffle, streams at any scale.

    → (doc_id, chunk_id, chunk_text, n_words).
    """
    import numpy as np
    import pyarrow.compute as pc

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # gaps would make some words unreachable and the last chunk
        # possibly empty — the chunk-count formula assumes coverage
        raise ValueError("stride must be <= window (overlapping coverage)")

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if len(texts) == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                    "n_words": pa.array([], pa.int64()),
                }
            )
        words = pc.split_pattern(texts, " ")
        nw = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        doc_base = np.concatenate(([0], np.cumsum(nw)[:-1]))  # flat offset per doc

        nch = np.where(nw <= window, 1, 1 + (nw - window + stride - 1) // stride)
        total_chunks = int(nch.sum())
        # per-chunk doc index and within-doc chunk id
        doc_of_chunk = np.repeat(np.arange(len(nw)), nch)
        chunk_id = np.arange(total_chunks) - np.repeat(
            np.concatenate(([0], np.cumsum(nch)[:-1])), nch
        )
        starts = chunk_id * stride
        ends = np.minimum(starts + window, nw[doc_of_chunk])
        lens = ends - starts
        # gather indices into the flat word array: for each chunk,
        # range(doc_base+start, doc_base+end) — the cumsum/repeat trick
        abs_starts = doc_base[doc_of_chunk] + starts
        total_words = int(lens.sum())
        idx = np.ones(total_words, dtype=np.int64)
        chunk_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx[chunk_off] = abs_starts - np.concatenate(([0], (abs_starts + lens)[:-1] - 1))
        idx = np.cumsum(idx)
        gathered = pc.take(flat, pa.array(idx, type=pa.int64()))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))), type=pa.int32()
        )
        chunk_lists = pa.ListArray.from_arrays(offsets, gathered.combine_chunks() if isinstance(gathered, pa.ChunkedArray) else gathered)
        sep = pa.scalar(" ", type=flat.type)
        chunk_text = pc.binary_join(chunk_lists, sep)
        ids = pc.take(batch.column(id_col), pa.array(doc_of_chunk, type=pa.int64()))
        return pa.table(
            {
                id_col: ids,
                "chunk_id": pa.array(chunk_id, type=pa.int64()),
                "chunk_text": pc.cast(chunk_text, pa.string()),
                "n_words": pa.array(lens, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def bm25_search(
    ds: rd.Dataset,
    queries: "dict[int, list[str]]",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """BM25 retrieval: top-``k`` documents per query under the Okapi
    ranking function (k1=1.2, b=0.75), ties by ``doc_id``.
    → ``(query_id, doc_id, score, rank)``.

    Reference analog: none — beyond-reference retrieval op; the
    idf/length-normalized ranker on top of :func:`keyword_search`'s
    raw term counts.

    EXACTNESS CONTRACT: each term's contribution is ONE fixed float
    expression — ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``contrib = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl /
    avgdl)))`` — quantized to integer millionths with
    ``floor(x * 1e6 + 0.5)`` BEFORE the per-query summation, so the
    score is an associativity-proof BIGINT sum and the DuckDB oracle
    (same expression text, same libm) matches bit-for-bit at any
    parallelism. Never sum raw doubles across terms: float addition
    order is engine-dependent.

    Scale shape: two streaming passes. Pass 1 collapses to a BOUNDED
    stats residue (per-batch df partials for the query's terms only +
    one (n_docs, sum_dl) row — at most ``terms x blocks`` rows ever
    leave a task). Pass 2 broadcasts the tiny stats in the batch
    closure, scores each batch vectorized (flattened word array +
    per-query bincounts), keeps a local top-k, and ONE residue
    hash-partition merges the partials — identical shuffle volume to
    :func:`keyword_search`.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    terms_all = sorted({t for ts in queries.values() for t in ts})
    narrow = ds.select_columns([id_col, text_col])

    # ---- pass 1: corpus stats (bounded residue -> driver) ----------
    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        words = pc.split_pattern(batch.column(text_col), " ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        if len(lens) == 0:
            return pd.DataFrame(
                {"term": pd.Series([], dtype="object"),
                 "df": pd.Series([], dtype="int64"),
                 "n_docs": pd.Series([], dtype="int64"),
                 "sum_dl": pd.Series([], dtype="int64")}
            )
        flat = pd.Series(pc.list_flatten(words).to_pandas(), dtype="object")
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        rows = [("", 0, int(len(lens)), int(lens.sum()))]
        for t in terms_all:
            mask = (flat == t).to_numpy()
            if mask.any():
                ndocs_with = len(np.unique(doc_idx[mask]))
                rows.append((t, ndocs_with, 0, 0))
        return pd.DataFrame(
            rows, columns=["term", "df", "n_docs", "sum_dl"]
        )

    stats = narrow.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if "term" in stats.columns:
        # Ray's to_pandas drops columns when every block is empty, so
        # an all-empty corpus lands in the n_docs==0 branch below
        stats = stats.groupby("term", as_index=False).sum()
        n_docs = float(stats["n_docs"].sum())
        sum_dl = float(stats["sum_dl"].sum())
    else:
        n_docs = sum_dl = 0.0
    if n_docs == 0:
        # derive the empty frame's id dtype from the input schema so
        # an empty string-id corpus matches the non-empty path's
        # id-dtype-preserving contract (same rule as local() below)
        sch = narrow.schema()
        id_arrow = dict(zip(sch.names, sch.types))[id_col]
        if isinstance(id_arrow, pa.DataType):
            id_dtype = (
                "object"
                if pa.types.is_string(id_arrow)
                or pa.types.is_large_string(id_arrow)
                else "int64"
            )
        else:
            # simple-block datasets report Python types, not Arrow
            id_dtype = (
                "int64"
                if isinstance(id_arrow, type)
                and issubclass(id_arrow, (int, np.integer))
                else "object"
            )
        return rd.from_pandas(
            pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 id_col: pd.Series([], dtype=id_dtype),
                 "score": pd.Series([], dtype="int64"),
                 "rank": pd.Series([], dtype="int64")}
            )
        )
    avgdl = sum_dl / n_docs
    df_of = dict(zip(stats["term"], stats["df"].astype(float)))
    # fixed float expression — lockstep with sqlmirror.BM25_SEARCH_SQL.
    # math.log (libm) — numpy's log can differ from DuckDB ln by a ulp
    import math as _math

    idf_of = {
        t: _math.log(1.0 + (n_docs - df_of.get(t, 0.0) + 0.5)
                     / (df_of.get(t, 0.0) + 0.5))
        for t in terms_all
    }

    # ---- pass 2: score + local top-k -------------------------------
    def local(batch: pa.Table) -> pd.DataFrame:
        # id dtype is PRESERVED (int64 doc ids and string url ids both
        # work); the empty frame mirrors the batch's Arrow id type so
        # all blocks agree on schema
        id_dtype = (
            "object"
            if pa.types.is_string(batch.schema.field(id_col).type)
            or pa.types.is_large_string(batch.schema.field(id_col).type)
            else "int64"
        )
        _empty = {
            "query_id": pd.Series([], dtype="int64"),
            id_col: pd.Series([], dtype=id_dtype),
            "score": pd.Series([], dtype="int64"),
        }
        words = pc.split_pattern(batch.column(text_col), " ")
        lens = pc.list_value_length(words).to_numpy().astype(np.int64)
        if len(lens) == 0:
            return pd.DataFrame(_empty)
        flat = pd.Series(pc.list_flatten(words).to_pandas(), dtype="object")
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        dl = lens.astype(np.float64)
        parts = []
        for qid, qterms in queries.items():
            score = np.zeros(len(lens), dtype=np.int64)
            hit = np.zeros(len(lens), dtype=bool)
            for t in qterms:
                mask = (flat == t).to_numpy()
                if not mask.any():
                    continue
                tf = np.bincount(doc_idx[mask], minlength=len(lens)).astype(
                    np.float64
                )
                nz = tf > 0
                hit |= nz
                contrib = np.floor(
                    idf_of[t] * (tf[nz] * 2.2)
                    / (tf[nz] + 1.2 * (0.25 + 0.75 * (dl[nz] / avgdl)))
                    * 1000000.0 + 0.5
                ).astype(np.int64)
                score[nz] += contrib
            if not hit.any():
                continue
            nzd = np.nonzero(hit)[0]
            part = pd.DataFrame(
                {
                    "query_id": np.full(len(nzd), qid, dtype=np.int64),
                    id_col: ids[nzd],
                    "score": score[nzd],
                }
            )
            parts.append(
                part.sort_values(
                    ["score", id_col], ascending=[False, True]
                ).head(k)
            )
        if not parts:
            return pd.DataFrame(_empty)
        return pd.concat(parts, ignore_index=True)

    local_ds = narrow.map_batches(local, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False, group_keys=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (
            g.groupby("query_id", sort=False).cumcount() + 1
        ).astype("int64")
        return g

    return partitioned_apply(local_ds, ["query_id"], merge)


def unigram_nll_scores(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
    keep_cols: "list[str] | None" = None,
    fit_ds: "rd.Dataset | None" = None,
) -> rd.Dataset:
    """CCNet-style language-model quality scoring: per-document
    negative log-likelihood under a hashed-unigram LM fitted on the
    corpus itself (add-one smoothing over ``n_buckets`` hash buckets).
    High mean NLL = far from the corpus distribution (gibberish,
    boilerplate soup, wrong language); the standard head/middle/tail
    perplexity triage keys off this score.

    → (doc_id, n_words, nll_micro, mean_nll).

    EXACTNESS CONTRACT (the :func:`bm25_search` device): each
    OCCURRENCE's logprob is quantized once per bucket —
    ``nll_u[h] = floor(-ln((c[h] + 1.0) / (T + n_buckets)) * 1e6 +
    0.5)`` — and the per-doc score is the BIGINT sum of those
    integers, so it is associativity-proof and the DuckDB mirror
    (same expression, same libm) is bit-exact at any parallelism.
    ``mean_nll`` is the single float division nll/n_words on top.

    Reference analog: none — beyond-reference training-data op.

    Scale shape: two streaming passes. Pass 1 collapses each batch to
    ≤ n_buckets (term-hash, count) residue rows and pre-aggregates —
    the LM fit is one bounded shuffle. The quantized table (0.5 MB at
    65536 buckets) is broadcast once via ``ray.put``; pass 2 scores
    each batch vectorized (hash once per unique word per batch,
    bincount with exact-integer float64 weights — per-doc sums stay
    far under 2^53, where float64 addition of integers is exact).
    """
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    extra = list(keep_cols or [])
    narrow = ds.select_columns([id_col, text_col] + extra)
    # the LM-fit pass only needs text; ``fit_ds`` lets a caller whose
    # ``ds`` carries an expensive upstream lineage (doc_tiers' gate
    # chain) fit over the cheap raw read instead — the fitted model is
    # identical because both see the same text column
    fit_narrow = (
        fit_ds.select_columns([text_col]) if fit_ds is not None else narrow
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64")}
            )
        buckets, _ = _hashed_word_buckets(batch[text_col].tolist(), n_buckets)
        c = np.bincount(buckets, minlength=n_buckets)
        h = np.nonzero(c)[0]
        return pd.DataFrame(
            {"h": h.astype(np.int64), "c": c[h].astype(np.int64)}
        )

    totals = grouped_sums(
        fit_narrow.map_batches(count_partial, batch_format="pandas"),
        ["h"], ["c"],
    ).to_pandas()  # bounded residue: <= n_buckets rows
    counts = np.zeros(n_buckets, dtype=np.int64)
    if len(totals):
        counts[totals["h"].to_numpy()] = totals["c"].to_numpy()
    big_t = float(counts.sum())
    # fixed float expression — lockstep with sqlmirror.UNIGRAM_NLL_SQL.
    # math.log per bucket (libm): numpy's vectorized log deviates from
    # DuckDB's ln by last-ulp on some inputs, which can flip the floor
    # at a quantization boundary
    import math as _math

    denom = big_t + float(n_buckets)
    nll_u = np.fromiter(
        (
            int(_math.floor(-_math.log((c + 1.0) / denom) * 1000000.0 + 0.5))
            for c in counts.tolist()
        ),
        dtype=np.int64,
        count=n_buckets,
    )
    ref = ray.put(nll_u)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # id dtype is PRESERVED (int64 doc ids and string url ids both
        # work — same contract as bm25_search's pass 2); the empty
        # frame reuses the batch's own empty id series so all blocks
        # agree on schema
        if batch.empty:
            out = pd.DataFrame(
                {id_col: batch[id_col].reset_index(drop=True),
                 "n_words": pd.Series([], dtype="int64"),
                 "nll_micro": pd.Series([], dtype="int64"),
                 "mean_nll": pd.Series([], dtype="float64")}
            )
            for c in extra:
                out[c] = batch[c].reset_index(drop=True)
            return out
        import numpy as np

        table = ray.get(ref)
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), n_buckets)
        row_of = np.repeat(np.arange(len(batch)), lens)
        nll = np.bincount(
            row_of, weights=table[buckets].astype(np.float64),
            minlength=len(batch),
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_words": lens,
                "nll_micro": nll,
                "mean_nll": nll.astype(np.float64) / lens.astype(np.float64),
            }
        )
        for c in extra:
            out[c] = batch[c].to_numpy()
        return out

    return narrow.map_batches(score, batch_format="pandas")


def build_term_index(
    ds: rd.Dataset,
    index_dir: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist a positional-free inverted index: ``(term, doc_id,
    tf)`` postings parquet PARTITIONED BY ``bucket = md5_u64(term) %
    n_buckets`` (hive layout) — the text-retrieval twin of
    :func:`similarity.build_ivf_index`. The write-once index lets
    :func:`keyword_search_indexed` open only the query terms' bucket
    directories (path-level partition pruning), so repeated searches
    never rescan the corpus.

    Scale shape: one streaming pass; each batch collapses to its
    (term, doc, tf) counts vectorized (a doc's text lives in one row,
    so tf is complete per batch — no combine shuffle needed before
    the write); the partitioned write is the only data movement.
    """
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64
    from vlm_ocr_doc_reader_ray.stages.scrub import arrow_word_ngrams

    def explode(batch: pa.Table) -> pd.DataFrame:
        import numpy as np

        grams, doc_idx = arrow_word_ngrams(batch.column(text_col), 1)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[doc_idx]
        df = (
            pd.DataFrame({"term": grams.to_pandas(), id_col: ids})
            .groupby(["term", id_col], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        df["tf"] = df["tf"].astype("int64")
        # hash once per unique term in the batch, not per posting
        uniq = df["term"].unique()
        b_of = {t: md5_u64(t) % n_buckets for t in uniq}
        df["bucket"] = df["term"].map(b_of).astype("int64")
        return df

    ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["bucket"])


def keyword_search_indexed(
    index_dir: str,
    queries: "dict[int, list[str]]",
    k: int = 10,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """:func:`keyword_search` through the PERSISTED term index: the
    read opens only the buckets hosting the query terms (hive
    partition filter — scan bytes drop ~``len(terms)/n_buckets``),
    matching postings collapse to (query_id, doc, score) residues,
    one residue aggregation sums multi-term scores, and the same
    top-k merge ranks them. Identical output contract to the
    scan-path op, so the SAME oracle gates both — a green hash proves
    index build + pruned read == full scan.
    """
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )
    from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64

    from ray.data.datasource.partitioning import PathPartitionFilter

    terms_all = sorted({t for ts in queries.values() for t in ts})
    probed = {str(md5_u64(t) % n_buckets) for t in terms_all}
    pf = PathPartitionFilter.of(
        lambda kv: kv.get("bucket") in probed, style="hive"
    )
    postings = rd.read_parquet(index_dir, partition_filter=pf)

    def match(batch: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for qid, qterms in queries.items():
            hit = batch[batch["term"].isin(qterms)]
            if hit.empty:
                continue
            g = hit.groupby(id_col, as_index=False)["tf"].sum()
            g.insert(0, "query_id", np.int64(qid))
            parts.append(g.rename(columns={"tf": "score"}))
        if not parts:
            # empty frame mirrors the postings' id dtype so blocks
            # agree on schema whether ids are int64 or string
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    id_col: pd.Series([], dtype=batch[id_col].dtype
                                      if len(batch.columns) else "int64"),
                    "score": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(parts, ignore_index=True)

    partials = postings.map_batches(match, batch_format="pandas")
    summed = grouped_sums(partials, ["query_id", id_col], ["score"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False, group_keys=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (
            g.groupby("query_id", sort=False).cumcount() + 1
        ).astype("int64")
        return g

    return partitioned_apply(summed, ["query_id"], merge)


def perplexity_buckets(
    scored: rd.Dataset,
    score_col: str = "mean_nll",
    id_col: str = "doc_id",
    bins: int = 1024,
    keep_cols: tuple = (),
) -> rd.Dataset:
    """CCNet-style head/middle/tail triage: split documents into
    thirds by LM score (:func:`unigram_nll_scores`' ``mean_nll``) —
    head = closest to the model distribution, tail = farthest.

    Thresholds come from the deterministic fixed-width histogram
    (:func:`aggregates.approx_quantiles`' device, never a sampled
    sketch): exact global (min, max), exact per-bin counts, tertile
    bins = first bin whose cumulative count reaches
    ``ceil(q*n)`` for q = 1/3, 2/3. Assignment compares each doc's
    BIN (same clamp-floor expression both engines) to the threshold
    bins — pure integer comparisons, so the only floats in the gate
    are the shared bin/ceil expressions, bit-identical in numpy and
    DuckDB.

    → (doc_id, mean_nll, bucket) with bucket ∈ head|middle|tail.

    Reference analog: none — beyond-reference training-data op
    (Wenzek et al., "CCNet", LREC 2020: perplexity-bucketed corpus
    triage).

    Scale shape: two residue-bounded passes over ``scored`` (min/max,
    then ≤ ``bins`` count rows) + one vectorized assignment pass.
    ``scored`` is consumed three times — pass a PINNED or
    checkpointed score table (it is a narrow per-doc projection; at
    10^12 docs spill it to parquet first, exactly like
    ``curate(persist='disk')``), or the upstream lineage re-executes
    per pass.
    """
    import math

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    mm = scored.aggregate(
        _Min(score_col, alias_name="lo"), _Max(score_col, alias_name="hi")
    )
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi <= lo:
        # degenerate: every doc identical → everything is head
        def all_head(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    id_col: batch[id_col],
                    score_col: batch[score_col],
                    "bucket": "head",
                }
            )
            for c in keep_cols:
                out[c] = batch[c].values
            return out

        return scored.map_batches(all_head, batch_format="pandas")

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        idx = np.clip(
            np.floor((v - lo) / (hi - lo) * bins).astype(np.int64),
            0, bins - 1,
        )
        c = np.bincount(idx, minlength=bins)
        nz = np.nonzero(c)[0]
        return pa.table(
            {"b": pa.array(nz, type=pa.int64()),
             "c": pa.array(c[nz], type=pa.int64())}
        )

    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(_Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("b", ignore_index=True)
    )
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum()

    def thr_bin(q: float) -> int:
        target = max(math.ceil(q * n), 1)
        return int(hist["b"].iloc[int((cum >= target).idxmax())])

    b1, b2 = thr_bin(1.0 / 3), thr_bin(2.0 / 3)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[score_col].to_numpy(np.float64)
        idx = np.clip(
            np.floor((v - lo) / (hi - lo) * bins).astype(np.int64),
            0, bins - 1,
        )
        bucket = np.where(
            idx <= b1, "head", np.where(idx <= b2, "middle", "tail")
        )
        out = pd.DataFrame(
            {
                id_col: batch[id_col],
                score_col: batch[score_col],
                "bucket": bucket,
            }
        )
        for c in keep_cols:
            out[c] = batch[c].values
        return out

    return scored.map_batches(assign, batch_format="pandas")


def winnow_fingerprints(
    ds: rd.Dataset,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS algorithm): from each document's word-
    3-shingle hash sequence, every window of ``w`` consecutive hashes
    contributes its RIGHTMOST minimal hash; the distinct selected
    (position, hash) pairs are the fingerprint sketch. Guarantees:
    any shared run of >= w+2 words produces at least one shared
    fingerprint (local, position-robust near-dup detection at
    ~2/(w+1) density — cheaper than full shingle sets, unlike MinHash
    it localizes the match).

    → (doc_id, pos, gram_hash), pos = 0-based shingle index,
    gram_hash = md5_u64 of the shingle (uint64 — the engine-wide hash
    contract, UBIGINT in the mirror). Docs with fewer than ``w``
    shingles yield no windows, hence no fingerprints (documented
    edge; both engines agree).

    Scale shape: fully ROW-LOCAL — no shuffle at all; each batch maps
    to its fingerprint rows vectorized (sliding_window_view argmin on
    the reversed window axis gives the rightmost-min rule in one numpy
    pass per doc). Downstream dedup joins group by gram_hash exactly
    like the span-dedup residues.
    """
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64, word_shingles

    def winnow(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_id, out_pos, out_hash = [], [], []
        for did, text in zip(ids, batch.column(text_col).to_pylist()):
            sh = word_shingles(text)
            n = len(sh)
            if n < w:
                continue
            h = np.fromiter(
                (md5_u64(s) for s in sh), dtype=np.uint64, count=n
            )
            sw = sliding_window_view(h, w)
            # argmin returns the FIRST minimum; on the reversed window
            # axis that is the RIGHTMOST minimum of the original
            idx = (w - 1) - sw[:, ::-1].argmin(axis=1)
            sel = np.unique(np.arange(n - w + 1) + idx)
            out_id.extend([did] * len(sel))
            out_pos.extend(sel.tolist())
            out_hash.extend(h[sel].tolist())
        return pa.table(
            {
                id_col: pa.array(out_id, type=batch.schema.field(id_col).type),
                "pos": pa.array(out_pos, type=pa.int64()),
                "gram_hash": pa.array(
                    np.array(out_hash, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        winnow, batch_format="pyarrow"
    )


def char_entropy_scores(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> rd.Dataset:
    """Character-level Shannon entropy per document — the cheap
    gibberish / binary-junk / repeated-filler detector (near-zero
    entropy = one repeated character; ~4.2 bits is typical English
    prose; near-log2(alphabet) = random noise).

    → (doc_id, n_chars, ent_sum_micro, entropy) where
    ``ent_sum_micro = Σ_c floor(cnt_c · ln(cnt_c) · 1e6 + 0.5)``
    (BIGINT — each distinct character contributes ONE quantized term,
    so the sum is associativity-proof) and
    ``entropy = (ln(n) - (S/1e6)/n) / ln(2)`` bits, a single shared
    float expression on top of exact integers (from
    H = ln n − (1/n)·Σ cnt·ln cnt).

    Reference analog: none — beyond-reference quality signal.

    Scale shape: fully row-local, zero shuffles — each batch maps to
    its per-doc rows with one bincount over codepoints.
    """
    import math

    import numpy as np
    import pandas as pd

    # math.log (libm), NEVER np.log on arrays: numpy's vectorized log
    # is SIMD-approximated and differs from DuckDB's ln by last-ulp on
    # ~20% of inputs — enough to flip the strict value-hash gate.
    ln2 = math.log(2.0)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        n_out = len(batch)
        n_chars = np.empty(n_out, dtype=np.int64)
        s_micro = np.empty(n_out, dtype=np.int64)
        for i, t in enumerate(batch[text_col]):
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            n_chars[i] = len(codes)
            if len(codes) == 0:
                s_micro[i] = 0
                continue
            cnt = np.unique(codes, return_counts=True)[1]
            s_micro[i] = sum(
                int(math.floor(k * math.log(k) * 1000000.0 + 0.5))
                for k in cnt.tolist()
            )
        ent = np.array(
            [
                (math.log(n) - (s / 1000000.0) / n) / ln2 if n > 0 else 0.0
                for n, s in zip(n_chars.tolist(), s_micro.tolist())
            ],
            dtype=np.float64,
        )
        out = pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_chars": n_chars,
                "ent_sum_micro": s_micro,
                "entropy": ent,
            }
        )
        for c in keep_cols:
            # positional, not index-aligned — out inherits batch's index
            # from the id Series only when pandas chooses to; .values
            # sidesteps the ambiguity
            out[c] = batch[c].values
        return out

    sel = [id_col, text_col] + [
        c for c in keep_cols if c not in (id_col, text_col)
    ]
    return ds.select_columns(sel).map_batches(score, batch_format="pandas")


def nb_classifier_scores(
    ds: rd.Dataset,
    positive_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
    keep_cols: "list[str] | None" = None,
    filter_cols: "list[str] | None" = None,
) -> rd.Dataset:
    """Distributed Naive-Bayes quality classifier — the fasttext-style
    "looks like the reference corpus" filter of the GPT-3/LLaMA data
    recipes (seed-positive docs define the target distribution;
    every doc is scored by how much more likely its words are under
    the positive class than the negative). High ``mean_llr`` = keep.

    ``positive_filter(batch: pd.DataFrame) -> bool mask`` marks the
    seed-positive rows (same device as
    :func:`importance_count_tables`'s target_filter); columns it
    reads beyond id/text go in ``filter_cols`` — they ride the FIT
    pass's projection only and never widen the scored output.

    → (id, n_words, llr_micro, mean_llr).

    EXACTNESS CONTRACT (the :func:`unigram_nll_scores` device): the
    per-bucket log-likelihood ratio is quantized ONCE —
    ``llr_u[h] = floor((ln((cp[h]+1)/(Tp+B)) - ln((cn[h]+1)/(Tn+B)))
    · 1e6 + 0.5)`` with ``math.log`` (libm, lockstep with DuckDB's
    ``ln``) — and the per-doc score is the BIGINT sum of those
    integers, associativity-proof at any parallelism.

    Reference analog: none — beyond-reference training-data op.

    Scale shape: ONE streaming pass collapses each batch to
    ≤ n_buckets (hash, pos_count, neg_count) residue rows (both class
    tables together — the corpus is read once); the fit is one
    bounded shuffle; the quantized 0.5 MB table broadcasts via
    ``ray.put``; the scoring pass is vectorized bincount, and the id
    dtype is preserved (string url ids work).
    """
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    extra = list(keep_cols or [])
    narrow = ds.select_columns([id_col, text_col] + extra)
    fit_cols = [text_col] + [c for c in (filter_cols or []) if c != text_col]
    fit_narrow = ds.select_columns(fit_cols)

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="int64"),
                 "pc": pd.Series([], dtype="int64"),
                 "nc": pd.Series([], dtype="int64")}
            )
        mask = np.asarray(positive_filter(batch), dtype=bool)
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), n_buckets)
        occ_pos = np.repeat(mask, lens)
        pc = np.bincount(buckets[occ_pos], minlength=n_buckets)
        nc = np.bincount(buckets[~occ_pos], minlength=n_buckets)
        h = np.nonzero(pc + nc)[0]
        return pd.DataFrame(
            {"h": h.astype(np.int64),
             "pc": pc[h].astype(np.int64),
             "nc": nc[h].astype(np.int64)}
        )

    totals = grouped_sums(
        fit_narrow.map_batches(count_partial, batch_format="pandas"),
        ["h"], ["pc", "nc"],
    ).to_pandas()  # bounded residue: <= n_buckets rows
    pc = np.zeros(n_buckets, dtype=np.int64)
    nc = np.zeros(n_buckets, dtype=np.int64)
    if len(totals):
        pc[totals["h"].to_numpy()] = totals["pc"].to_numpy()
        nc[totals["h"].to_numpy()] = totals["nc"].to_numpy()
    tp = float(pc.sum()) + float(n_buckets)
    tn = float(nc.sum()) + float(n_buckets)
    import math as _math

    llr_u = np.fromiter(
        (
            int(_math.floor(
                (_math.log((p + 1.0) / tp) - _math.log((n + 1.0) / tn))
                * 1000000.0 + 0.5
            ))
            for p, n in zip(pc.tolist(), nc.tolist())
        ),
        dtype=np.int64,
        count=n_buckets,
    )
    ref = ray.put(llr_u)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            out = pd.DataFrame(
                {id_col: batch[id_col].reset_index(drop=True),
                 "n_words": pd.Series([], dtype="int64"),
                 "llr_micro": pd.Series([], dtype="int64"),
                 "mean_llr": pd.Series([], dtype="float64")}
            )
            for c in extra:
                out[c] = batch[c].reset_index(drop=True)
            return out
        import numpy as np

        table = ray.get(ref)
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), n_buckets)
        row_of = np.repeat(np.arange(len(batch)), lens)
        # per-doc sums of |llr|<=~2e7 over ~2e3 words stay far under
        # 2^53, where float64 addition of integers is exact
        llr = np.bincount(
            row_of, weights=table[buckets].astype(np.float64),
            minlength=len(batch),
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_words": lens,
                "llr_micro": llr,
                "mean_llr": llr.astype(np.float64) / lens.astype(np.float64),
            }
        )
        for c in extra:
            out[c] = batch[c].to_numpy()
        return out

    return narrow.map_batches(score, batch_format="pandas")


def tfidf_search(
    ds: rd.Dataset,
    queries: "dict[int, list[str]]",
    k: int = 10,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Hashed TF-IDF cosine retrieval — the text→vector bridge: each
    document becomes a ``n_buckets``-dimensional hashed tf·idf vector
    (the feature-hashing trick) and each query (a bag of words) is
    ranked against it by cosine, top-``k`` per query, ties →
    ``doc_id``. → ``(query_id, doc_id, dot, cosine, rank)``.

    EXACTNESS CONTRACT (the :func:`bm25_search` /
    :func:`unigram_nll_scores` device, extended to cosine): idf is
    quantized ONCE per bucket to integer millis —
    ``idf_m[h] = floor(ln((N+1)/(df[h]+1)) · 1e3 + 0.5)`` (libm log,
    lockstep with DuckDB ``ln``) — so every vector component
    ``w = tf · idf_m`` is an exact BIGINT, and dot products and
    squared norms are exact BIGINT sums (bounded: tf ≤ doc words,
    idf_m ≤ ~14k → all sums ≪ 2^53). The ONLY float is the final
    shared expression ``dot / (sqrt(ssd) · sqrt(ssq))`` — IEEE sqrt
    is correctly rounded, so numpy and DuckDB agree bit-for-bit.
    Zero-dot (no shared bucket) pairs are excluded on both sides.

    Reference analog: none — beyond-reference retrieval op; the
    scale path for embedding-free semantic-ish search (pair with
    :mod:`similarity`'s ANN ops when real embeddings exist).

    Scale shape: two streaming passes. Pass 1 collapses each batch to
    ≤ n_buckets distinct-(doc,bucket) df residues (+ one doc-count
    carrier row) — bounded shuffle. The quantized idf table (32 KB)
    and the query vectors broadcast once; pass 2 scores each batch
    with one dense int64 matmul and keeps its local top-k per query,
    so at most k × blocks rows per query ever move; one residue
    hash-partition merges the partials."""
    import math

    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )

    B = n_buckets

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64")}
            )
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), B)
        row_of = np.repeat(np.arange(len(lens)), lens)
        pair_h = np.unique(row_of.astype(np.int64) * B + buckets) % B
        c = np.bincount(pair_h, minlength=B)
        h = np.nonzero(c)[0]
        out = pd.DataFrame(
            {"h": h.astype(np.int64), "c": c[h].astype(np.int64)}
        )
        # carrier row h=-1: document count (rides the same residue)
        return pd.concat(
            [out, pd.DataFrame({"h": [-1], "c": [len(lens)]})],
            ignore_index=True,
        )

    totals = grouped_sums(
        ds.select_columns([text_col]).map_batches(
            df_partial, batch_format="pandas"
        ),
        ["h"], ["c"],
    ).to_pandas()  # bounded residue: <= n_buckets + 1 rows
    if "h" not in totals.columns:  # empty corpus: groupby loses schema
        totals = pd.DataFrame({"h": pd.Series([], dtype="int64"),
                               "c": pd.Series([], dtype="int64")})
    n_docs = int(totals.loc[totals["h"] == -1, "c"].sum())
    df_counts = np.zeros(B, dtype=np.int64)
    real = totals[totals["h"] >= 0]
    if len(real):
        df_counts[real["h"].to_numpy()] = real["c"].to_numpy()
    # fixed float expression — lockstep with sqlmirror.tfidf_search_sql
    idf_m = np.fromiter(
        (
            int(math.floor(
                math.log((n_docs + 1.0) / (d + 1.0)) * 1000.0 + 0.5
            ))
            for d in df_counts.tolist()
        ),
        dtype=np.int64,
        count=B,
    )

    # query vectors (tiny, closure-broadcast): sparse (h -> wq), ssq
    qvecs: dict = {}
    for qid, terms in queries.items():
        tf: dict = {}
        for w in terms:
            h = _md5_u64(w) % B
            tf[h] = tf.get(h, 0) + 1
        hq = np.fromiter(tf.keys(), dtype=np.int64, count=len(tf))
        wq = np.fromiter(
            (tf[h] * int(idf_m[h]) for h in tf), dtype=np.int64,
            count=len(tf),
        )
        ssq = int((wq * wq).sum())
        qvecs[qid] = (hq, wq, ssq)

    _empty = {
        "query_id": pd.Series([], dtype="int64"),
        id_col: pd.Series([], dtype="int64"),
        "dot": pd.Series([], dtype="int64"),
        "cosine": pd.Series([], dtype="float64"),
    }

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(_empty)
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), B)
        n = len(lens)
        row_of = np.repeat(np.arange(n), lens)
        w_mat = np.zeros((n, B), dtype=np.int64)
        np.add.at(w_mat, (row_of, buckets), idf_m[buckets])
        ssd = np.einsum("ij,ij->i", w_mat, w_mat)  # exact int64
        ids = batch[id_col].to_numpy()
        sqrt_ssd = np.sqrt(ssd.astype(np.float64))
        parts = []
        for qid, (hq, wq, ssq) in qvecs.items():
            if ssq == 0:
                continue
            dot = w_mat[:, hq] @ wq  # exact int64
            nz = np.nonzero(dot > 0)[0]
            if len(nz) == 0:
                continue
            cosine = dot[nz].astype(np.float64) / (
                sqrt_ssd[nz] * math.sqrt(float(ssq))
            )
            part = pd.DataFrame(
                {
                    "query_id": np.full(len(nz), qid, dtype=np.int64),
                    id_col: ids[nz],
                    "dot": dot[nz].astype(np.int64),
                    "cosine": cosine,
                }
            )
            parts.append(
                part.sort_values(
                    ["cosine", id_col], ascending=[False, True]
                ).head(k)
            )
        if not parts:
            return pd.DataFrame(_empty)
        return pd.concat(parts, ignore_index=True)

    local_ds = ds.select_columns([id_col, text_col]).map_batches(
        local, batch_format="pandas"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False, group_keys=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (
            g.groupby("query_id", sort=False).cumcount() + 1
        ).astype("int64")
        return g

    return partitioned_apply(local_ds, ["query_id"], merge)


def build_tfidf_index(
    ds: rd.Dataset,
    index_dir: str,
    n_buckets: int = 4096,
    part_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist the hashed TF-IDF vector index :func:`tfidf_search`
    computes on the fly — the cosine-retrieval twin of
    :func:`build_term_index`:

    - ``postings/`` — ``(h, doc_id, w)`` integer weight postings,
      parquet PARTITIONED BY ``part = h % part_buckets`` (hive) so a
      search opens only its query buckets' directories;
    - ``norms/``    — the narrow ``(doc_id, ssd)`` squared-norm table;
    - ``idf/``      — the full quantized idf table (``n_buckets``
      rows incl. df=0 buckets, + the doc count) so the query side
      reproduces the scan path's vectors exactly.

    Same exactness contract as the scan op (milli-quantized idf,
    BIGINT weights/norms), so :func:`tfidf_search_indexed` is gated
    by the SAME oracle — a green hash proves build + pruned read ==
    full scan.

    Scale shape: one df-residue pass, then one streaming pass that
    emits each doc's sparse weights and its norm; the partitioned
    write is the only data movement."""
    import math

    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    B = n_buckets

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64")}
            )
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), B)
        row_of = np.repeat(np.arange(len(lens)), lens)
        pair_h = np.unique(row_of.astype(np.int64) * B + buckets) % B
        c = np.bincount(pair_h, minlength=B)
        h = np.nonzero(c)[0]
        out = pd.DataFrame(
            {"h": h.astype(np.int64), "c": c[h].astype(np.int64)}
        )
        return pd.concat(
            [out, pd.DataFrame({"h": [-1], "c": [len(lens)]})],
            ignore_index=True,
        )

    totals = grouped_sums(
        ds.select_columns([text_col]).map_batches(
            df_partial, batch_format="pandas"
        ),
        ["h"], ["c"],
    ).to_pandas()
    if "h" not in totals.columns:  # empty corpus: groupby loses schema
        totals = pd.DataFrame({"h": pd.Series([], dtype="int64"),
                               "c": pd.Series([], dtype="int64")})
    n_docs = int(totals.loc[totals["h"] == -1, "c"].sum())
    df_counts = np.zeros(B, dtype=np.int64)
    real = totals[totals["h"] >= 0]
    if len(real):
        df_counts[real["h"].to_numpy()] = real["c"].to_numpy()
    idf_m = np.fromiter(
        (
            int(math.floor(
                math.log((n_docs + 1.0) / (d + 1.0)) * 1000.0 + 0.5
            ))
            for d in df_counts.tolist()
        ),
        dtype=np.int64,
        count=B,
    )

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "h": pd.Series([], dtype="int64"),
                 "w": pd.Series([], dtype="int64"),
                 "part": pd.Series([], dtype="int64")}
            )
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), B)
        row_of = np.repeat(np.arange(len(lens)), lens)
        key = row_of.astype(np.int64) * B + buckets
        uniq, counts = np.unique(key, return_counts=True)
        rows, hs = uniq // B, uniq % B
        w = counts.astype(np.int64) * idf_m[hs]
        ids = batch[id_col].to_numpy()
        out = pd.DataFrame(
            {id_col: ids[rows], "h": hs.astype(np.int64),
             "w": w, "part": (hs % part_buckets).astype(np.int64)}
        )
        return out[out["w"] > 0]

    ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pandas"
    ).write_parquet(f"{index_dir}/postings", partition_cols=["part"])

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "ssd": pd.Series([], dtype="int64")}
            )
        buckets, lens = _hashed_word_buckets(batch[text_col].tolist(), B)
        row_of = np.repeat(np.arange(len(lens)), lens)
        n = len(lens)
        w_mat = np.zeros((n, B), dtype=np.int64)
        np.add.at(w_mat, (row_of, buckets), idf_m[buckets])
        ssd = np.einsum("ij,ij->i", w_mat, w_mat)
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(), "ssd": ssd}
        )

    ds.select_columns([id_col, text_col]).map_batches(
        norm, batch_format="pandas"
    ).write_parquet(f"{index_dir}/norms")

    pd.DataFrame(
        {"h": np.arange(B, dtype=np.int64), "idf_m": idf_m,
         "n_docs": np.full(B, n_docs, dtype=np.int64)}
    ).to_parquet(f"{index_dir}/idf.parquet")


def tfidf_search_indexed(
    index_dir: str,
    queries: "dict[int, list[str]]",
    k: int = 10,
    part_buckets: int = 64,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """:func:`tfidf_search` through the PERSISTED index: query
    vectors rebuild from the stored idf table, the postings read
    opens ONLY the query buckets' hive partitions, matched postings
    collapse to (query_id, doc, dot) residues, one co-partitioned
    join attaches the stored norms, and the same top-k merge ranks by
    the identical shared cosine expression. Gated by the SAME oracle
    as the scan path."""
    import math

    import numpy as np
    import pandas as pd

    from ray.data.datasource.partitioning import PathPartitionFilter

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    idf_df = pd.read_parquet(f"{index_dir}/idf.parquet")
    B = len(idf_df)
    idf_of = dict(zip(idf_df["h"].astype(int), idf_df["idf_m"].astype(int)))

    qvecs: dict = {}
    probed: set = set()
    for qid, terms in queries.items():
        tf: dict = {}
        for w in terms:
            h = _md5_u64(w) % B
            tf[h] = tf.get(h, 0) + 1
        wq = {h: c * idf_of[h] for h, c in tf.items()}
        ssq = sum(v * v for v in wq.values())
        qvecs[qid] = (wq, ssq)
        probed |= {str(h % part_buckets) for h in wq}

    pf = PathPartitionFilter.of(
        lambda kv: kv.get("part") in probed, style="hive"
    )
    postings = rd.read_parquet(f"{index_dir}/postings", partition_filter=pf)

    def match(batch: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for qid, (wq, ssq) in qvecs.items():
            if ssq == 0:
                continue
            hit = batch[batch["h"].isin(wq)]
            if hit.empty:
                continue
            contrib = hit["w"].to_numpy() * np.fromiter(
                (wq[h] for h in hit["h"]), dtype=np.int64, count=len(hit)
            )
            g = pd.DataFrame({id_col: hit[id_col].to_numpy(),
                              "dot": contrib})
            g = g.groupby(id_col, as_index=False)["dot"].sum()
            g.insert(0, "query_id", np.int64(qid))
            parts.append(g)
        if not parts:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    id_col: pd.Series(
                        [], dtype=batch[id_col].dtype
                        if len(batch.columns) else "int64"
                    ),
                    "dot": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(parts, ignore_index=True)

    dots = grouped_sums(
        postings.map_batches(match, batch_format="pandas"),
        ["query_id", id_col], ["dot"],
    )
    norms = rd.read_parquet(f"{index_dir}/norms")
    joined = partitioned_hash_join(dots, norms, id_col, id_col)

    ssq_of = {qid: ssq for qid, (_, ssq) in qvecs.items()}

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["dot"] > 0].copy()
        if batch.empty:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    id_col: batch[id_col] if id_col in batch else
                    pd.Series([], dtype="int64"),
                    "dot": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        ssq = np.fromiter(
            (ssq_of[q] for q in batch["query_id"]), dtype=np.int64,
            count=len(batch),
        )
        cosine = batch["dot"].to_numpy().astype(np.float64) / (
            np.sqrt(batch["ssd"].to_numpy().astype(np.float64))
            * np.sqrt(ssq.astype(np.float64))
        )
        out = pd.DataFrame(
            {
                "query_id": batch["query_id"].to_numpy(),
                id_col: batch[id_col].to_numpy(),
                "dot": batch["dot"].to_numpy(),
                "cosine": cosine,
            }
        )
        return out.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True]
        ).groupby("query_id", sort=False, group_keys=False).head(k)

    local = joined.map_batches(score, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False, group_keys=False).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (
            g.groupby("query_id", sort=False).cumcount() + 1
        ).astype("int64")
        return g

    return partitioned_apply(local, ["query_id"], merge)
