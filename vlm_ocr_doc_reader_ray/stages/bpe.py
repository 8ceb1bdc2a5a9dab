"""Distributed BPE tokenizer training + encoding.

The tokenizer-training step of an LM data pipeline, with the classic
scale decomposition (the one real tokenizer trainers use): the corpus
collapses to a ``(word, count)`` frequency table with ONE distributed
pre-aggregated pass — bounded by vocabulary size, not corpus size —
and the merge loop runs driver-side over that table (each of the K
iterations is dict arithmetic over ≤|vocab| entries, never a corpus
scan). Encoding is then a broadcast-merges map stage: ``ray.put`` the
rank table once, greedy lowest-rank merging per word inside
``map_batches`` with an LRU word cache (Zipf makes the cache hit rate
high).

Determinism: ties in pair frequency break lexicographically, so the
learned merge list is a pure function of the corpus — pinned equal to
a sequential reference implementation by test.

Reference: Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016) — the word-frequency formulation of
Algorithm 1.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data as rd

END = "</w>"  # end-of-word marker, standard BPE convention


def word_frequencies(ds: rd.Dataset, text_col: str = "text") -> pd.DataFrame:
    """Corpus → (word, n) table: per-batch Arrow explode +
    ``value_counts`` combiner, global pre-aggregated sum. The driver
    receives ≤ |vocab| rows (empty-string tokens from ``split(' ')``
    are dropped — they carry no characters to merge)."""
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        vc = pc.value_counts(words)
        return pa.table(
            {"word": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    totals = grouped_sums(
        ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow"),
        ["word"], ["n"],
    ).to_pandas()
    if totals.empty:
        return pd.DataFrame({"word": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    return totals[totals["word"] != ""].reset_index(drop=True)


def train_bpe_from_frequencies(
    freqs: pd.DataFrame, num_merges: int
) -> list[tuple[str, str]]:
    """Sequential BPE merge loop over a (word, n) table — each
    iteration counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent pair (ties → lexicographically smallest),
    and rewrites only the words containing it."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in zip(freqs["word"], freqs["n"]):
        vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + int(n)

    merges: list[tuple[str, str]] = []
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set] = {}
    for sym, n in vocab.items():
        for p in zip(sym, sym[1:]):
            pair_counts[p] += n
            where.setdefault(p, set()).add(sym)

    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for sym in list(where.get(best, ())):
            n = vocab.pop(sym, None)
            if n is None:
                continue
            # un-count old pairs
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(sym)
                    if not s:
                        del where[p]
            # rewrite the word with the merge applied
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            vocab[new] = vocab.get(new, 0) + n
            for p in zip(new, new[1:]):
                pair_counts[p] += n
                where.setdefault(p, set()).add(new)
    return merges


def train_bpe(
    ds: rd.Dataset, num_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Distributed word-count pass + driver merge loop (bounded by
    vocabulary, not corpus)."""
    return train_bpe_from_frequencies(word_frequencies(ds, text_col), num_merges)


# Fixed tokenizer artifact: a deterministic merge list trained (by
# THIS module's trainer) on an embedded seed vocabulary — the BPE
# analogue of similarity.fixed_codebook. Corpus-trained merges are a
# pure function of the data (pinned by test against a textbook
# recount); the FIXED list exists so the distributed ENCODE stage can
# be gated by a DuckDB oracle whose literal merge table is known
# statically (sqlmirror.BPE_TOKEN_LENGTHS_SQL embeds the same list —
# lockstep by construction, both sides read this constant).
_SEED_FREQS = [
    ("the", 620), ("of", 420), ("and", 390), ("to", 350), ("in", 300),
    ("is", 250), ("that", 210), ("for", 180), ("with", 160), ("order", 150),
    ("table", 140), ("scan", 130), ("batch", 125), ("stream", 120),
    ("window", 115), ("hash", 110), ("join", 105), ("sort", 100),
    ("merge", 95), ("key", 90), ("fast", 85), ("small", 80), ("part", 75),
    ("data", 70), ("query", 65), ("index", 60), ("shuffle", 55),
    ("filter", 50), ("reduce", 45), ("block", 40), ("spark", 38),
    ("worker", 36), ("write", 34), ("read", 32), ("group", 30),
    ("count", 28), ("token", 26), ("text", 24), ("word", 22),
    ("store", 20), ("cache", 18), ("slow", 16), ("dup", 14),
    ("page", 12), ("node", 10),
]
FIXED_NUM_MERGES = 120
_fixed_merges_cache: list[tuple[str, str]] | None = None


def fixed_merges() -> list[tuple[str, str]]:
    """The fixed merge artifact (trained once per process, cached)."""
    global _fixed_merges_cache
    if _fixed_merges_cache is None:
        freqs = pd.DataFrame(
            {"word": [w for w, _ in _SEED_FREQS],
             "n": [n for _, n in _SEED_FREQS]}
        )
        _fixed_merges_cache = train_bpe_from_frequencies(freqs, FIXED_NUM_MERGES)
    return _fixed_merges_cache


def bpe_segment(word: str, ranks: dict) -> list[str]:
    """Greedy lowest-rank merging of one word (standard BPE encode)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncoder:
    """Actor-pool encode stage: merges broadcast once (pass the
    ``ray.put`` ObjectRef via ``fn_constructor_kwargs``, or the raw
    list for stateless use), per-word LRU memo in ``__init__`` — Zipf
    makes the repeated-word hit rate dominate.

    ``__call__`` emits ``(id, bpe_len)`` per doc — the int64 token
    COUNT, the usual curation need (length for packing); with
    ``emit_tokens=True`` a ``bpe_tokens`` list<string> column is
    added. The memo is a size-capped dict (2^18 distinct words, no
    eviction — Zipf means the head is what repeats)."""

    def __init__(self, merges, id_col: str = "doc_id",
                 text_col: str = "text", emit_tokens: bool = False,
                 keep_cols: tuple = (), emit_n_words: bool = False) -> None:
        import ray

        if isinstance(merges, ray.ObjectRef):
            merges = ray.get(merges)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.id_col, self.text_col = id_col, text_col
        self.emit_tokens = emit_tokens
        self.keep_cols = tuple(keep_cols)
        self.emit_n_words = emit_n_words
        self._memo: dict[str, list[str]] = {}

    def _seg(self, w: str) -> list[str]:
        hit = self._memo.get(w)
        if hit is None:
            hit = bpe_segment(w, self.ranks)
            if len(self._memo) < 1 << 18:
                self._memo[w] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts, toks, nwords = [], [], []
        for t in texts:
            doc = []
            words = t.split(" ")
            for w in words:
                if w:
                    doc.extend(self._seg(w))
            counts.append(len(doc))
            if self.emit_n_words:
                nwords.append(len(words))
            if self.emit_tokens:
                toks.append(doc)
        cols = {self.id_col: batch.column(self.id_col),
                "bpe_len": pa.array(counts, type=pa.int64())}
        if self.emit_n_words:
            cols["n_words"] = pa.array(nwords, type=pa.int64())
        if self.emit_tokens:
            cols["bpe_tokens"] = pa.array(toks, type=pa.list_(pa.string()))
        for c in self.keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)


def bpe_encode(
    ds: rd.Dataset,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_tokens: bool = False,
    keep_cols: tuple = (),
    emit_n_words: bool = False,
) -> rd.Dataset:
    """Corpus → per-doc BPE token counts (optionally the tokens, a
    ``n_words`` column, and passed-through ``keep_cols`` — the
    zero-shuffle alternative to a doc_id join when a downstream
    aggregate needs e.g. the source column)."""
    import ray

    ref = ray.put(list(merges))
    # autoscaling pool: min size 1 (the concurrency tuple below) so
    # other stages can't starve — the fixed-size-pool deadlock trap —
    # and max capped BELOW the cluster CPU count so the upstream read
    # stage always has headroom even when the pool is fully scaled.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    max_actors = max(2, cpus - 2)
    return ds.select_columns([id_col, text_col, *keep_cols]).map_batches(
        BpeEncoder,
        fn_constructor_kwargs=dict(
            merges=ref, id_col=id_col, text_col=text_col,
            emit_tokens=emit_tokens, keep_cols=tuple(keep_cols),
            emit_n_words=emit_n_words,
        ),
        concurrency=(1, max_actors),
        batch_size=1024,
        batch_format="pyarrow",
    )


def bpe_fertility_by_group(
    ds: rd.Dataset,
    merges: list[tuple[str, str]],
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Tokenizer-fertility report per ``group_col``: documents, words
    (``split(' ')`` convention), BPE tokens, and ``fertility_ppm`` =
    half-up integer ppm of tokens-per-word — the standard "how well
    does this tokenizer fit each corpus slice" diagnostic (fertility
    ≫ 1e6 means the vocabulary fragments that slice's words).

    Scale shape: the encode stage passes ``group_col`` through
    (zero-copy column, no doc_id join), per-batch combiner collapses
    to ≤|groups| residue rows, one small groupby sums them — the
    corpus never shuffles.
    """
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    enc = bpe_encode(
        ds, merges, id_col=id_col, text_col=text_col,
        keep_cols=(group_col,), emit_n_words=True,
    )

    def partial(batch: pa.Table) -> pa.Table:
        one = pa.array([1] * batch.num_rows, type=pa.int64())
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_docs": one,
                "n_words": batch.column("n_words"),
                "n_tokens": batch.column("bpe_len"),
            }
        )

    # checkpoint=True: the residues (≤|groups| rows per block) pin so
    # the groupby's shuffle sampling can't re-run the encode lineage.
    sums = grouped_sums(
        enc.map_batches(partial, batch_format="pyarrow"),
        [group_col], ["n_docs", "n_words", "n_tokens"],
        checkpoint=True,
    )

    def fertility(batch: pa.Table) -> pa.Table:
        toks = batch.column("n_tokens").to_pylist()
        words = batch.column("n_words").to_pylist()
        ppm = [
            0 if w == 0 else (t * 2_000_000 + w) // (2 * w)
            for t, w in zip(toks, words)
        ]
        return batch.append_column(
            "fertility_ppm", pa.array(ppm, type=pa.int64())
        )

    return sums.map_batches(fertility, batch_format="pyarrow")
