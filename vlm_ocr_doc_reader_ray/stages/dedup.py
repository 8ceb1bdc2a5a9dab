"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Corpus-dedup patterns for a 10^12-document pipeline (the reference's
only dedup is content-hash workspace identity + entity-id upsert,
``core/state.py:225-241,795-822`` — these lift the idea to corpus
scale):

- **exact**: content-hash column (vectorized) → per-batch keep-first
  combiner → hash-partitioned vectorized keep-first per partition.
  The shuffle moves at most one row per (hash, batch); nothing is
  ever materialized on the driver in the streaming path.
- **MinHash+LSH**: per-doc k-permutation minhash over word shingles →
  banded bucket keys → hash-partitioned self-merge emits candidate
  pairs only within buckets → texts re-attached by DISTRIBUTED hash
  joins (never a driver lookup table) → exact-Jaccard verification
  inside ``map_batches``. All hashes are explicit (blake2b-seeded
  multiply-shift), never Python's randomized ``hash()``, so
  signatures are identical at any parallelism / process.
- **SimHash**: 64-bit sign-sum fingerprint; near-dup candidates via
  band-equality on 4×16-bit chunks (Hamming ≤ 3 ⇒ some band equal,
  pigeonhole — recall is exactly 1). Pair emission is a vectorized
  self-merge + SWAR popcount, never a Python double loop. The word
  hash is md5-based so the DuckDB oracle can recompute fingerprints
  bit-for-bit in SQL.
- **n-gram Jaccard**: the exact verifier, also exposed standalone.

Skew note: a pathological bucket (e.g. an empty-shingle bucket) would
blow up the pair count; ``max_bucket`` caps ids per bucket and pairs
from a capped bucket carry ``truncated=True`` so truncation is
visible in the output, never silent.

Tokenization contract: words are ``text.split(' ')`` (single-space
split, exactly DuckDB's ``string_split(text, ' ')``) so the SQL
oracles stay in bit-for-bit lockstep on any input, not just
single-spaced ASCII.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------------------
# stable hashing (never Python hash(): PYTHONHASHSEED would break identity)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def md5_u64(s: str) -> int:
    """First 8 bytes of md5, big-endian — mirrored in SQL by
    ``('0x' || substr(md5(w), 1, 16))::UBIGINT``."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _perm_params(n_perm: int, seed: int = 0x5EED) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-shift parameters per permutation."""
    a = np.empty(n_perm, dtype=np.uint64)
    b = np.empty(n_perm, dtype=np.uint64)
    for i in range(n_perm):
        d = hashlib.blake2b(f"perm:{seed}:{i}".encode(), digest_size=16).digest()
        a[i] = int.from_bytes(d[:8], "big") | 1  # odd
        b[i] = int.from_bytes(d[8:], "big")
    return a, b


def word_shingles(text: str, n: int = 3) -> List[str]:
    # split(' ') — NOT split() — to stay in lockstep with the SQL
    # oracle's string_split(text, ' ') on multi-space input
    words = text.split(" ")
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    v = v.astype(np.uint64, copy=True)
    v -= (v >> np.uint64(1)) & np.uint64(0x5555555555555555)
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def with_text_hash(ds: rd.Dataset, text_col: str = "text", out_col: str = "text_hash") -> rd.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(out_col, pa.array(hashes, type=pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def dedup_exact(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_winners: bool = False,
) -> rd.Dataset:
    """Keep the min-id row per distinct ``text_col`` value.

    Pipeline: content-hash column → per-batch keep-first combiner →
    winner selection. Two modes, both free of per-key Ray dispatch:

    - ``broadcast_winners=False`` (default — the scale path, and the
      measured-fastest one): fully streaming — the combined residue
      is hash-partitioned by text_hash and each partition keeps
      winners with one vectorized sort + drop_duplicates. NOTHING is
      materialized on the driver; works for corpora whose distinct
      set dwarfs any single node.
    - ``broadcast_winners=True``: the one-less-shuffle variant for
      when the distinct-text residue comfortably fits in memory —
      per-block combine, coalesce, then the (hash, id) residue is
      reduced to a winner-id set and broadcast via ``ray.put`` for a
      shuffle-free filter. O(distinct) driver memory BY CONTRACT;
      prefer the default when in doubt.
    """
    import ray

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    hashed = with_text_hash(ds, text_col)

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).drop_duplicates("text_hash", keep="first")

    combined = hashed.map_batches(local_first, batch_format="pandas")

    def part_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).drop_duplicates("text_hash", keep="first")

    if not broadcast_winners:
        return partitioned_apply(combined, ["text_hash"], part_first)

    # level-2 coalesced combine, then the small (hash, id) residue is
    # reduced on the driver to the winner-id set (deliberate
    # O(distinct) footprint — that is this mode's contract)
    partials = (
        combined.select_columns(["text_hash", id_col])
        .repartition(32)
        .map_batches(part_first, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    winner_ids = set(part_first(partials)[id_col])
    ref = ray.put(winner_ids)

    def keep_winners(batch: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(ref)
        return batch[batch[id_col].isin(ids)]

    return combined.map_batches(keep_winners, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool kernel: adds a minhash signature column.

    Permutation parameters are derived once per actor in ``__init__``
    (warm state); signatures are uint64[n_perm] per doc."""

    def __init__(self, n_perm: int = 64, shingle_n: int = 3, text_col: str = "text") -> None:
        self.a, self.b = _perm_params(n_perm)
        self.n_perm = n_perm
        self.shingle_n = shingle_n
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        shingles = word_shingles(text, self.shingle_n)
        if not shingles:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.array([stable_u64(s) for s in shingles], dtype=np.uint64)
        # multiply-shift over all (shingle, perm) pairs, vectorized
        prod = base[:, None] * self.a[None, :] + self.b[None, :]  # wraps mod 2^64
        return prod.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column(self.text_col).to_pylist()]
        arr = pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64(), self.n_perm))
        return batch.append_column("minhash", arr)


# deterministic 64-bit mixer for band keys (Fibonacci-hash style
# fold of the band's signature lanes; collisions only create false
# candidates, which exact verification removes)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def band_bucket_rows(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    bands: int = 16,
) -> rd.Dataset:
    """(id, band, bucket) rows — the banded-minhash bucket stream
    shared by in-corpus LSH (:func:`lsh_candidate_pairs`) and the
    persisted incremental index (:func:`build_minhash_index`).
    Bucket keys are the Fibonacci-fold of the band's signature
    lanes; the SAME fold on both sides is what makes day-N buckets
    joinable against a day-0 index."""
    rows_per_band = n_perm // bands
    # stateless instance: MinHasher state is tiny. If a pool is ever
    # pinned here, size it BELOW the cluster CPU count — a pool that
    # reserves every CPU starves the task stages and the pipeline
    # deadlocks (observed on a 4-CPU test cluster with concurrency=4).
    sig_ds = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher(n_perm=n_perm, text_col=text_col),
        batch_format="pyarrow",
    )

    def to_buckets(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sig_col = batch.column("minhash")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs = sig_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        sigs = sigs.reshape(n, n_perm)
        ids = batch.column(id_col)
        parts = []
        for band in range(bands):
            chunk = sigs[:, band * rows_per_band: (band + 1) * rows_per_band]
            key = np.full(n, np.uint64(band + 1), dtype=np.uint64)
            for lane in range(rows_per_band):
                key = (key * _MIX) ^ chunk[:, lane]
            parts.append(
                pa.table(
                    {
                        id_col: ids,
                        "band": pa.array(np.full(n, band, dtype=np.int32)),
                        "bucket": pa.array(key.view(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return sig_ds.map_batches(to_buckets, batch_format="pyarrow")


def lsh_candidate_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    max_bucket: int = 200,
) -> rd.Dataset:
    """(id_a, id_b, band, truncated) candidate rows from banded
    minhash buckets.

    Bucket keys are a vectorized fold of the band's signature lanes;
    pair emission is a hash-partitioned SELF-MERGE per (band, bucket)
    — one vectorized pandas merge per partition, never a Python loop
    over buckets. Buckets larger than ``max_bucket`` are capped to
    their ``max_bucket`` smallest ids and the surviving pairs carry
    ``truncated=True`` so the cap is visible in the output.
    """
    buckets = band_bucket_rows(ds, id_col, text_col, n_perm, bands)

    def emit_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=g[id_col].dtype),
                "id_b": pd.Series([], dtype=g[id_col].dtype),
                "band": pd.Series([], dtype="int32"),
                "truncated": pd.Series([], dtype="bool"),
            }
        )
        if g.empty:
            return empty
        g = g.drop_duplicates([id_col, "band", "bucket"]).sort_values(id_col)
        # cap: keep each bucket's max_bucket smallest ids, flag the rest
        rank = g.groupby(["band", "bucket"], sort=False).cumcount()
        sizes = g.groupby(["band", "bucket"], sort=False)[id_col].transform("size")
        g = g.assign(__trunc=(sizes > max_bucket))[rank < max_bucket]
        m = g.merge(g, on=["band", "bucket"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy(),
                "id_b": m[f"{id_col}_b"].to_numpy(),
                "band": m["band"].astype("int32").to_numpy(),
                "truncated": (m["__trunc_a"] | m["__trunc_b"]).to_numpy(),
            }
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    # thousands of tiny buckets: one vectorized self-merge per hash
    # partition, not per-group dispatch
    return partitioned_apply(buckets, ["band", "bucket"], emit_part)


def distinct_pairs(pairs: rd.Dataset, cols: Sequence[str] = ("id_a", "id_b")) -> rd.Dataset:
    """Distributed pair-distinct: per-batch combiner then one
    hash-partitioned vectorized drop_duplicates (a pair can surface
    from several bands; nothing reaches the driver)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    col_list = list(cols)

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(col_list)

    local_d = pairs.map_batches(local, batch_format="pandas")
    return partitioned_apply(local_d, col_list, local)


def minhash_near_dups(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    on_truncate: str = "raise",
    max_bucket: int = 200,
) -> rd.Dataset:
    """(id_a, id_b, jaccard) verified near-duplicate pairs.

    Fully distributed: LSH candidates → distributed pair-distinct →
    the two texts are re-attached by two HASH JOINS against the
    corpus (Ray's hash-partitioned ``Dataset.join``; the corpus is
    never collected into a driver lookup table) → exact word-shingle
    Jaccard verifies each pair inside ``map_batches``.

    Recall: a true pair at jaccard ``J`` is a candidate with
    probability ``1-(1-J^r)^b`` (r = n_perm/bands rows per band); at
    the default 16×4, J=0.8 pairs are missed with p≈2e-4 — pass
    ``bands=32`` (r=2) to push that to ~1e-14 when exactness at the
    threshold matters more than candidate-count.

    Bucket-cap visibility (``on_truncate``): pairs surviving a capped
    LSH bucket carry ``truncated=True`` from
    :func:`lsh_candidate_pairs`, meaning OTHER true pairs in that
    bucket were silently dropped. ``"raise"`` (default) fails loudly
    the moment a truncated pair appears — skewed data must be an
    explicit decision, not a silent recall hole; ``"flag"`` keeps a
    ``truncated`` column in the output; ``"ignore"`` restores the old
    silent behavior.
    """
    if on_truncate not in ("raise", "flag", "ignore"):
        raise ValueError(f"on_truncate must be raise|flag|ignore, got {on_truncate!r}")
    pairs = lsh_candidate_pairs(ds, id_col, n_perm, bands, text_col, max_bucket)
    cand = distinct_pairs_keep_flag(pairs)
    cand = _apply_truncation_policy(cand, on_truncate, "minhash_near_dups")
    return verify_jaccard_pairs(cand, ds, id_col, text_col, threshold)


def distinct_pairs_keep_flag(pairs: rd.Dataset) -> rd.Dataset:
    """Distributed pair-distinct KEEPING the truncation flag: a pair
    is truncated if ANY occurrence came from a capped bucket."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["id_a", "id_b"], sort=False, as_index=False)["truncated"]
            .max()
        )

    combined = pairs.select_columns(["id_a", "id_b", "truncated"]).map_batches(
        local_distinct, batch_format="pandas"
    )
    return partitioned_apply(combined, ["id_a", "id_b"], local_distinct)


def _apply_truncation_policy(cand: rd.Dataset, on_truncate: str, op: str) -> rd.Dataset:
    if on_truncate == "raise":

        def check(batch: pd.DataFrame) -> pd.DataFrame:
            if batch["truncated"].any():
                bad = batch[batch["truncated"]].head(3)[["id_a", "id_b"]]
                raise RuntimeError(
                    f"{op}: bucket cap truncated candidate "
                    f"buckets (e.g. pairs {bad.to_dict('records')}); recall is "
                    "no longer exhaustive. Raise max_bucket, pre-dedup exact "
                    "duplicates, or pass on_truncate='flag'/'ignore'."
                )
            return batch.drop(columns="truncated")

        return cand.map_batches(check, batch_format="pandas")
    if on_truncate == "ignore":
        return cand.drop_columns(["truncated"])
    return cand


def verify_jaccard_pairs(
    cand: rd.Dataset,
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    threshold: float,
    ds_b: "rd.Dataset | None" = None,
) -> rd.Dataset:
    """Exact word-shingle Jaccard verification of candidate pairs.

    Re-attaches the two texts by DISTRIBUTED hash joins against the
    corpus (the corpus is never collected into a driver lookup table),
    then scores each pair inside ``map_batches``. Shared verifier tail
    of every near-dup candidate generator (MinHash LSH, prefix
    filtering); keeps a ``truncated`` column if the candidates carry
    one. ``ds_b`` (optional) supplies the ``id_b`` side from a
    DIFFERENT corpus — the incremental cross-corpus case."""
    texts = ds.select_columns([id_col, text_col])
    texts_b = (
        ds_b.select_columns([id_col, text_col]) if ds_b is not None else texts
    )

    def rename(to_id: str, to_text: str):
        def _r(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([to_id, to_text])

        return _r

    # the explicit bucketed join (task-based shuffle), NOT the native
    # actor-pool join: two chained joins spawn two aggregator pools,
    # which starves small clusters (observed deadlock at 4 CPUs)
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    with_a = partitioned_hash_join(
        cand, texts.map_batches(rename("id_a", "text_a"), batch_format="pyarrow"),
        "id_a", "id_a",
    )
    with_b = partitioned_hash_join(
        with_a,
        texts_b.map_batches(rename("id_b", "text_b"), batch_format="pyarrow"),
        "id_b", "id_b",
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = np.array(
            [
                jaccard(word_shingles(a), word_shingles(b))
                for a, b in zip(batch["text_a"], batch["text_b"])
            ],
            dtype=np.float64,
        )
        keep_cols = ["id_a", "id_b"] + (
            ["truncated"] if "truncated" in batch.columns else []
        )
        out = batch[keep_cols].copy()
        out["jaccard"] = jac
        return out[out["jaccard"] >= threshold]

    return with_b.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via prefix filtering (deterministic 100% recall)
# ---------------------------------------------------------------------------

def prefix_filter_candidates(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_bucket: int = 200,
) -> rd.Dataset:
    """(id_a, id_b, truncated) candidate pairs with DETERMINISTIC
    100% recall at Jaccard >= ``threshold`` — prefix filtering
    (Chaudhuri et al., "A Primitive Operator for Similarity Joins",
    ICDE 2006), the exact complement to probabilistic MinHash LSH.

    Per doc: distinct word-3-shingle hashes sorted ascending (the
    global token order is the u64 hash value); the doc is emitted
    keyed by each hash in its first ``ns - ceil(t*ns) + 1`` tokens.
    Lemma: J(A,B) >= t implies |A∩B| >= ceil(t*max(|A|,|B|)), and two
    sets with overlap >= a must collide inside their
    ``len - a + 1``-prefixes under any shared total order — so every
    true pair meets in at least one token bucket. Buckets are hash
    partitions with a vectorized self-merge (same shape as
    :func:`lsh_candidate_pairs`); a pair-level size filter
    (``min(ns) >= ceil(t*max(ns))``) prunes impossible pairs before
    verification. Buckets over ``max_bucket`` are capped with a
    visible ``truncated`` flag, never silently.
    """
    eps = 1e-9

    def emit_prefixes(batch: pa.Table) -> pa.Table:
        ids, tokens, sizes = [], [], []
        id_vals = batch.column(id_col).to_pylist()
        for i, text in enumerate(batch.column(text_col).to_pylist()):
            hs = sorted({md5_u64(s) for s in word_shingles(text)})
            ns = len(hs)
            alpha = int(np.ceil(threshold * ns - eps))
            p = max(1, ns - alpha + 1)
            ids.extend([id_vals[i]] * p)
            tokens.extend(hs[:p])
            sizes.extend([ns] * p)
        return pa.table(
            {
                id_col: pa.array(ids, type=batch.schema.field(id_col).type),
                "token": pa.array(np.array(tokens, dtype=np.uint64).view(np.int64)),
                "ns": pa.array(sizes, type=pa.int64()),
            }
        )

    prefixes = ds.select_columns([id_col, text_col]).map_batches(
        emit_prefixes, batch_format="pyarrow"
    )

    def emit_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=g[id_col].dtype),
                "id_b": pd.Series([], dtype=g[id_col].dtype),
                "truncated": pd.Series([], dtype="bool"),
            }
        )
        if g.empty:
            return empty
        g = g.sort_values(id_col)
        rank = g.groupby("token", sort=False).cumcount()
        sizes = g.groupby("token", sort=False)[id_col].transform("size")
        g = g.assign(__trunc=(sizes > max_bucket))[rank < max_bucket]
        m = g.merge(g, on="token", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return empty
        # size filter: inter <= min(ns) and J>=t forces
        # min(ns) >= ceil(t*max(ns)); eps biases toward KEEPING
        lo = np.minimum(m["ns_a"].to_numpy(), m["ns_b"].to_numpy())
        hi = np.maximum(m["ns_a"].to_numpy(), m["ns_b"].to_numpy())
        ok = lo >= np.ceil(threshold * hi - eps)
        m = m[ok]
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy(),
                "id_b": m[f"{id_col}_b"].to_numpy(),
                "truncated": (m["__trunc_a"] | m["__trunc_b"]).to_numpy(),
            }
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    return partitioned_apply(prefixes, ["token"], emit_part)


def jaccard_near_dups(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_bucket: int = 200,
    on_truncate: str = "raise",
) -> rd.Dataset:
    """(id_a, id_b, jaccard) — the EXACT n-gram-Jaccard near-dup
    pairs at ``threshold``, no probabilistic recall caveat: prefix
    filtering guarantees every true pair becomes a candidate, and
    verification is exact shingle Jaccard. Output must equal the
    brute-force all-pairs self-join bit for bit (the SQL oracle).

    Scale shape: one prefix-emission pass, one token-hash shuffle of
    (id, token, ns) residues, one pair-distinct, two hash joins to
    re-attach texts, vectorized per-batch verification. Lower
    thresholds lengthen prefixes (cost grows ~ (1-t)*corpus tokens) —
    below ~0.5 prefer :func:`minhash_near_dups`.
    """
    if on_truncate not in ("raise", "flag", "ignore"):
        raise ValueError(f"on_truncate must be raise|flag|ignore, got {on_truncate!r}")
    pairs = prefix_filter_candidates(ds, id_col, text_col, threshold, max_bucket)
    cand = distinct_pairs_keep_flag(pairs)
    cand = _apply_truncation_policy(cand, on_truncate, "jaccard_near_dups")
    return verify_jaccard_pairs(cand, ds, id_col, text_col, threshold)


def group_vocab_overlap(
    ds: rd.Dataset,
    group_col: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Pairwise Jaccard similarity between GROUPS' vocabularies —
    corpus-overlap analysis across sources/dumps (which crawls dredge
    the same material?), the group-level twin of document near-dup.

    Scale shape: the corpus collapses in-map to distinct
    ``(group, word)`` residues (bounded by vocab × groups, not rows);
    one hash shuffle dedups them globally; per-WORD partitions emit
    pre-aggregated group-pair counts (each word's bucket is at most
    ``G`` rows); a residue groupby sums intersections. Only the final
    ``G + G²`` rows reach the driver, where the Jaccard is one exact
    integer division per pair. Pairs with empty intersection are
    omitted (both engines).
    """
    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        distinct_values,
        grouped_sums,
        partitioned_apply,
    )

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        df = (
            batch[[group_col, text_col]]
            .assign(word=batch[text_col].str.split(" "))
            .explode("word")[[group_col, "word"]]
            .drop_duplicates()
        )
        return df

    residues = ds.select_columns([group_col, text_col]).map_batches(
        emit, batch_format="pandas"
    )
    distinct = distinct_values(residues, [group_col, "word"])
    sizes = grouped_sums(distinct, [group_col], [], count_alias="n_vocab")

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source_a": pd.Series([], dtype="object"),
                "source_b": pd.Series([], dtype="object"),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        m = g.merge(g, on="word")
        m = m[m[f"{group_col}_x"] < m[f"{group_col}_y"]]
        if m.empty:
            return empty
        c = (
            m.groupby([f"{group_col}_x", f"{group_col}_y"], sort=False)
            .size()
            .reset_index(name="n_shared")
        )
        c.columns = ["source_a", "source_b", "n_shared"]
        return c

    pair_counts = partitioned_apply(distinct, ["word"], pairs_part)
    inter = grouped_sums(pair_counts, ["source_a", "source_b"], ["n_shared"])

    inter_df = inter.to_pandas()  # bounded: at most G^2 rows
    sizes_df = sizes.to_pandas()  # bounded: G rows
    out = inter_df.merge(
        sizes_df.rename(columns={group_col: "source_a", "n_vocab": "n_a"}), on="source_a"
    ).merge(
        sizes_df.rename(columns={group_col: "source_b", "n_vocab": "n_b"}), on="source_b"
    )
    out["jaccard"] = out["n_shared"].astype("float64") / (
        out["n_a"] + out["n_b"] - out["n_shared"]
    )
    cols = ["source_a", "source_b", "n_shared", "n_a", "n_b", "jaccard"]
    return out[cols].sort_values(["source_a", "source_b"], ignore_index=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit sign-sum fingerprint over distinct word features
    (weight 1). Word hash is md5-based (``md5_u64``) and the word
    split is ``split(' ')`` so a DuckDB oracle recomputes the exact
    fingerprint from SQL; the bit loop is vectorized numpy."""
    words = set(text.split(" "))
    if not words:
        return 0
    hs = np.array([md5_u64(w) for w in words], dtype=np.uint64)
    bits = (hs[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << _BIT_SHIFTS).sum())


def with_simhash(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(
            "simhash", pa.array([f"{h:016x}" for h in hs], type=pa.string())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def simhash_candidates(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> rd.Dataset:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Banding: with 4 bands of 16 bits, Hamming <= 3 implies at least
    one band identical (pigeonhole), so grouping by band value finds
    every qualifying pair without an all-pairs scan — recall is
    exactly 1 and the DuckDB all-pairs oracle must match bit-for-bit.
    Pair emission per (band, key) partition is a vectorized
    self-merge + SWAR popcount (no Python loop over bucket members)."""
    hashed = with_simhash(ds.select_columns([id_col, text_col]), text_col)

    def to_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        hs = np.array(
            [int(h, 16) for h in batch.column("simhash").to_pylist()], dtype=np.uint64
        )
        ids = batch.column(id_col)
        parts = []
        for band in range(4):
            key = (hs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            parts.append(
                pa.table(
                    {
                        id_col: ids,
                        "band": pa.array(np.full(n, band, dtype=np.int32)),
                        "key": pa.array(key.astype(np.int64)),
                        "simhash": pa.array(hs.view(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    bands = hashed.map_batches(to_bands, batch_format="pyarrow")

    def emit_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=g[id_col].dtype),
                "id_b": pd.Series([], dtype=g[id_col].dtype),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        g = g.drop_duplicates([id_col, "band", "key"]).sort_values(id_col)
        m = g.merge(g, on=["band", "key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return empty
        ham = popcount64(
            m["simhash_a"].to_numpy().view(np.uint64)
            ^ m["simhash_b"].to_numpy().view(np.uint64)
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy(),
                "id_b": m[f"{id_col}_b"].to_numpy(),
                "hamming": ham,
            }
        )
        return out[out["hamming"] <= max_hamming]

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    pairs = partitioned_apply(bands, ["band", "key"], emit_part)
    # a pair can surface from up to 4 bands: distributed distinct
    return distinct_pairs(pairs, ["id_a", "id_b"])


# ---------------------------------------------------------------------------
# near-dup clustering: distributed connected components
# ---------------------------------------------------------------------------

def cluster_pairs(
    pairs: rd.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    num_blocks: int = 8,
) -> rd.Dataset:
    """(doc_id, cluster) connected components of a near-dup pair set;
    ``cluster`` is the component's min id (the canonical keep-one
    representative rule).

    Pregel-style min-label propagation as Dataset supersteps: each
    iteration is one bucketed hash join (edge → neighbour label) plus
    one pre-aggregated grouped min — both scale-safe shuffles over
    (id, label) residues, no driver-side graph. The driver only
    coordinates iterations and reads ONE scalar per step: labels can
    only decrease, so the global label sum is a monotone convergence
    witness (equal sums ⇒ fixpoint). Iterations needed = max distance
    from any node to its component's min node — for near-dup data
    components are tiny/star-like, so a handful of supersteps; the
    algorithm is exact at any diameter.

    ``num_blocks`` pins the state's block count per superstep
    (measured: without the repartition each groupby emits ~200
    near-empty blocks which compound into the next sort shuffle —
    iteration time ballooned 2.8s → 38.7s by superstep 4; with the
    pin it stays flat ~3s). Scale it with cluster size — the state is
    (id, label) pairs for near-dup NODES only, not the corpus."""
    from ray.data.aggregate import Min, Sum

    def sym(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = batch[[id_a, id_b]].rename(columns={id_a: "u", id_b: "v"})
        rev = batch[[id_b, id_a]].rename(columns={id_b: "u", id_a: "v"})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = (
        pairs.map_batches(sym, batch_format="pandas")
        .repartition(num_blocks)
        .materialize()
    )

    # empty pair set: no components. Guard BEFORE any groupby/join —
    # Ray's groupby/join on an empty dataset loses the schema (pyarrow
    # "No match for FieldRef"), and aggregate(Sum) over empty labels
    # returns {'s': None} which would crash the convergence checksum.
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                }
            )
        )

    def _grouped_min(ds: rd.Dataset, key: str, val: str) -> rd.Dataset:
        def partial(batch: pa.Table) -> pa.Table:
            return (
                batch.select([key, val])
                .group_by([key])
                .aggregate([(val, "min")])
                .rename_columns([key, val])
            )

        partials = ds.map_batches(partial, batch_format="pyarrow")
        return partials.groupby(key).aggregate(Min(val, alias_name=val))

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        # label(v) = min(v, neighbours of v in this batch) — the init
        # grouped-min then yields min(v, min N(v)) globally: one full
        # propagation round folded into initialization for free
        own = pd.DataFrame({"id": batch["u"], "label": batch["u"]})
        nbr = pd.DataFrame({"id": batch["u"], "label": batch["v"]})
        return pd.concat([own, nbr], ignore_index=True).drop_duplicates()

    labels = (
        _grouped_min(
            edges.map_batches(init_labels, batch_format="pandas"), "id", "label"
        )
        .repartition(num_blocks)
        .materialize()
    )

    def checksum(ds: rd.Dataset) -> int:
        # None-safe: Sum over an empty dataset yields {'s': None}
        row = ds.aggregate(Sum("label", alias_name="s"))
        return int(row["s"] or 0)

    prev = checksum(labels)
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    for it in range(max_iters):
        lab_u = labels.map_batches(
            lambda b: b.rename(columns={"id": "u"}), batch_format="pandas"
        )
        # dtype pin: the pad/union inside the bucketed join can leave
        # `label` as float/object in some blocks (side padding mixes
        # int blocks with None blocks); a float label would then hash
        # into the WRONG bucket in the jump join below ("102.0" vs
        # "102") — parallelism-dependent wrong clusters (measured at
        # 4 CPUs). Force int64 at every step.
        cand = partitioned_hash_join(edges, lab_u, "u", "u").map_batches(
            lambda b: pd.DataFrame(
                {"id": b["v"].astype("int64"), "label": b["label"].astype("int64")}
            ),
            batch_format="pandas",
        )
        merged = cand.union(labels)
        labels = (
            _grouped_min(merged, "id", "label").repartition(num_blocks).materialize()
        )
        # convergence test BEFORE paying for a jump: labels only
        # decrease, so an unchanged sum means the min step was a
        # no-op — a propagate fixpoint, i.e. labels constant per
        # component (at which point the jump is the identity too)
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
        # pointer jumping (path halving): label(v) <- label(label(v)).
        # Turns the iteration bound from O(diameter) into
        # O(log diameter) — the difference between 10 and 1000
        # supersteps on a chain-shaped component at scale. Applied on
        # ALTERNATE supersteps only: each jump is a full extra shuffle
        # of fixed cost, and jumping every other round keeps the
        # logarithmic bound (path-halving at half rate) while halving
        # the per-round overhead that dominates at modest cluster
        # sizes.
        if it % 2 == 1:
            parents = labels.map_batches(
                lambda b: b.rename(columns={"id": "parent", "label": "parent_label"}),
                batch_format="pandas",
            )
            labels = (
                partitioned_hash_join(labels, parents, "label", "parent")
                .map_batches(
                    lambda b: pd.DataFrame(
                        {
                            "id": b["id"].astype("int64"),
                            "label": b["parent_label"].astype("int64"),
                        }
                    ),
                    batch_format="pandas",
                )
                .repartition(num_blocks)
                .materialize()
            )
            # NOTE: no break here — an unchanged sum after a jump only
            # says the jump was the identity (labels already point at
            # roots), NOT that propagation has converged; only the
            # post-min check above may terminate the loop.
            prev = checksum(labels)

    return labels.map_batches(
        lambda b: b.rename(columns={"id": "doc_id", "label": "cluster"}),
        batch_format="pandas",
    )


def keep_canonical(
    docs: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id"
) -> rd.Dataset:
    """End-to-end fuzzy-dedup decision: one ``(id, keep)`` row per
    document, keeping exactly one representative per near-dup cluster
    (its min id — the :func:`cluster_pairs` label) plus every
    unclustered document.

    The SlimPajama/FineWeb-style "drop the near-dups" step as one
    composable operator: connected components over the pair graph,
    then ONE distributed left join of the corpus ids against the
    cluster labels (docs absent from every pair keep by default).
    Nothing touches the driver; the join is Ray's hash-partitioned
    ``Dataset.join``."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.relational import native_hash_join

    clusters = cluster_pairs(pairs)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__cid": batch["doc_id"].astype("int64"),
                "keep_flag": (batch["doc_id"] == batch["cluster"]),
            }
        )

    flags = clusters.map_batches(flag, batch_format="pandas")
    ids = docs.select_columns([id_col])
    # labels are already materialized by the superstep loop, so this
    # count is a cheap rename pass — and joining an EMPTY right side
    # loses schema in this Ray version (pyarrow FieldRef errors)
    if flags.count() == 0:
        return ids.map_batches(
            lambda b: pd.DataFrame(
                {id_col: b[id_col].astype("int64"), "keep": True}
            ),
            batch_format="pandas",
        )
    joined = native_hash_join(
        ids, flags, id_col, "__cid", join_type="left_outer"
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["keep_flag"].astype("boolean").fillna(True).astype(bool)
        return pd.DataFrame({id_col: batch[id_col].astype("int64"), "keep": keep})

    return joined.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# incremental dedup against a persisted fingerprint index
# --------------------------------------------------------------------------

def build_hash_index(
    ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    hash_col: str = "text_hash",
) -> str:
    """Persist the corpus' content-hash fingerprint index as
    partitioned Parquet (one distinct sha256 per row). This is the
    durable side of INCREMENTAL ingestion: day-N batches dedupe
    against the index without re-reading day-1..N-1 texts — the index
    is hashes only, ~64 bytes/doc at any corpus size. Distinct-ness is
    enforced distributed (per-batch combiner + hash-partitioned
    dedupe); the write streams, never materializing the corpus."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import distinct_values

    hashed = with_text_hash(ds.select_columns([text_col]), text_col, hash_col)
    distinct = distinct_values(hashed.select_columns([hash_col]), [hash_col])
    distinct.write_parquet(index_dir)
    return index_dir


def dedup_against_index(
    ds: rd.Dataset,
    index_dir: str,
    text_col: str = "text",
    hash_col: str = "text_hash",
) -> rd.Dataset:
    """Keep only rows whose content hash appears NOWHERE in the
    persisted index — the day-N half of incremental ingestion. The
    index side ships only hash residues through ONE co-partitioning
    shuffle (the engine's padded-union anti-join); neither corpus is
    ever broadcast or materialized. Rows keep all input columns plus
    ``hash_col``."""
    import ray.data as rd_mod

    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_anti_join

    hashed = with_text_hash(ds, text_col, hash_col)
    index = rd_mod.read_parquet(index_dir)
    return partitioned_anti_join(hashed, index, hash_col, hash_col)


# ---------------------------------------------------------------------------
# exact directional n-gram containment (quote / syndication detection)
# ---------------------------------------------------------------------------

def containment_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_bucket: int = 400,
    on_truncate: str = "raise",
) -> rd.Dataset:
    """Directional containment join: pairs where inner's shingle set
    is mostly inside outer's — ``|S(inner) ∩ S(outer)| / |S(inner)|
    >= threshold_num/threshold_den`` (inner != outer). The asymmetric
    complement to :func:`jaccard_near_dups`: Jaccard misses a short
    quote inside a long article (union dominates); containment is the
    standard syndication/quotation/subset-page detector.

    → (inner_id, outer_id, n_inner, n_shared, containment), EXACT:
    the threshold is a rational gate (``den·shared >= num·n_inner``,
    pure int64 — no float ever decides membership), so the DuckDB
    brute-force self-join oracle matches unconditionally.

    Recall proof (prefix filtering, asymmetric variant — Chaudhuri et
    al. ICDE'06): c >= num/den ⟺ shared >= a where
    ``a = ceil(num·ns_inner/den)`` (integers). If none of the first
    ``p = ns_inner - a + 1`` sorted tokens of inner is in outer, then
    shared <= ns_inner - p = a - 1 < a. So emitting inner's p-prefix
    against outer's FULL token list guarantees every true pair meets
    in >= 1 bucket.

    Scale shape: the container side indexes its whole distinct-shingle
    stream (that is the price of exact asymmetric recall — the
    shuffle is proportional to corpus tokens, same order as the
    n-gram census); the query side emits only (1-t)-fraction
    prefixes. One token-hash shuffle, per-bucket vectorized
    prefix×full merge with a pair-level size filter
    (``den·ns_outer >= num·ns_inner``), pair-distinct, two hash joins
    to re-attach texts, exact per-pair verification. Buckets over
    ``max_bucket`` PER ROLE are capped with a visible ``truncated``
    flag, never silently.
    """
    if threshold_num <= 0 or threshold_den <= 0 or threshold_num > threshold_den:
        raise ValueError("threshold must be a fraction in (0, 1]")
    if on_truncate not in ("raise", "flag", "ignore"):
        raise ValueError(f"on_truncate must be raise|flag|ignore, got {on_truncate!r}")
    num, den = threshold_num, threshold_den

    def emit(batch: pa.Table) -> pa.Table:
        ids, tokens, sizes, roles = [], [], [], []
        id_vals = batch.column(id_col).to_pylist()
        for i, text in enumerate(batch.column(text_col).to_pylist()):
            hs = sorted({md5_u64(s) for s in word_shingles(text)})
            ns = len(hs)
            if ns == 0:
                continue
            a = (num * ns + den - 1) // den  # ceil(t*ns), exact
            p = max(1, ns - a + 1)
            # query role: prefix only
            ids.extend([id_vals[i]] * p)
            tokens.extend(hs[:p])
            sizes.extend([ns] * p)
            roles.extend([0] * p)
            # container role: full token list
            ids.extend([id_vals[i]] * ns)
            tokens.extend(hs)
            sizes.extend([ns] * ns)
            roles.extend([1] * ns)
        return pa.table(
            {
                id_col: pa.array(ids, type=batch.schema.field(id_col).type),
                "token": pa.array(
                    np.array(tokens, dtype=np.uint64).view(np.int64)
                ),
                "ns": pa.array(sizes, type=pa.int64()),
                "role": pa.array(roles, type=pa.int8()),
            }
        )

    emitted = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )

    def emit_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=g[id_col].dtype),
                "id_b": pd.Series([], dtype=g[id_col].dtype),
                "truncated": pd.Series([], dtype="bool"),
            }
        )
        if g.empty:
            return empty
        g = g.sort_values(id_col)
        rank = g.groupby(["token", "role"], sort=False).cumcount()
        sizes = g.groupby(["token", "role"], sort=False)[id_col].transform(
            "size"
        )
        g = g.assign(__trunc=(sizes > max_bucket))[rank < max_bucket]
        pref = g[g["role"] == 0]
        full = g[g["role"] == 1]
        if pref.empty or full.empty:
            return empty
        m = pref.merge(full, on="token", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] != m[f"{id_col}_b"]]
        if m.empty:
            return empty
        # size filter: shared <= ns_outer and c>=num/den needs
        # den*ns_outer >= num*ns_inner (weaker than ceil — keeps all)
        ok = (
            den * m["ns_b"].to_numpy()
            >= num * m["ns_a"].to_numpy()
        )
        m = m[ok]
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy(),
                "id_b": m[f"{id_col}_b"].to_numpy(),
                "truncated": (m["__trunc_a"] | m["__trunc_b"]).to_numpy(),
            }
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    pairs = partitioned_apply(emitted, ["token"], emit_part)
    cand = distinct_pairs_keep_flag(pairs)
    cand = _apply_truncation_policy(cand, on_truncate, "containment_pairs")

    texts = ds.select_columns([id_col, text_col])

    def rename(to_id: str, to_text: str):
        def _r(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([to_id, to_text])

        return _r

    with_a = partitioned_hash_join(
        cand,
        texts.map_batches(rename("id_a", "text_a"), batch_format="pyarrow"),
        "id_a", "id_a",
    )
    with_b = partitioned_hash_join(
        with_a,
        texts.map_batches(rename("id_b", "text_b"), batch_format="pyarrow"),
        "id_b", "id_b",
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        n_inner = np.empty(len(batch), dtype=np.int64)
        n_shared = np.empty(len(batch), dtype=np.int64)
        for i, (a, b) in enumerate(zip(batch["text_a"], batch["text_b"])):
            sa = set(word_shingles(a))
            n_inner[i] = len(sa)
            n_shared[i] = len(sa.intersection(word_shingles(b)))
        out = pd.DataFrame(
            {
                "inner_id": batch["id_a"].to_numpy(),
                "outer_id": batch["id_b"].to_numpy(),
                "n_inner": n_inner,
                "n_shared": n_shared,
                "containment": n_shared.astype(np.float64)
                / n_inner.astype(np.float64),
            }
        )
        if "truncated" in batch.columns:
            out["truncated"] = batch["truncated"].to_numpy()
        # rational gate: pure integers decide membership
        return out[den * out["n_shared"] >= num * out["n_inner"]]

    return with_b.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# incremental NEAR-dup ingestion: persisted minhash-band index
# ---------------------------------------------------------------------------

def build_minhash_index(
    ds: rd.Dataset,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    bands: int = 16,
) -> str:
    """Persist the corpus' banded-minhash index: ``buckets/`` holds
    (id, band, bucket) rows parquet-partitioned by ``band`` and
    ``texts/`` the (id, text) rows for exact verification — the
    NEAR-dup analogue of :func:`build_hash_index` (which only catches
    byte-identical text). Day-N crawls dedupe against it via
    :func:`near_dups_against_index` without recomputing day-0
    signatures.

    Scale shape: one signature pass over the corpus (actor-warm
    multiply-shift permutations), one partitioned write; nothing
    aggregates."""
    import os

    narrow = ds.select_columns([id_col, text_col])
    band_bucket_rows(narrow, id_col, text_col, n_perm, bands).write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["band"]
    )
    narrow.write_parquet(os.path.join(index_dir, "texts"))
    return index_dir


def near_dups_against_index(
    ds: rd.Dataset,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    on_truncate: str = "raise",
) -> rd.Dataset:
    """(id_a, id_b, jaccard): new-corpus docs (``id_b``) whose exact
    shingle Jaccard against an INDEXED doc (``id_a``) is >=
    ``threshold`` — incremental near-dup ingestion. The new corpus'
    band buckets join the persisted buckets on (band, bucket) —
    candidate recall is the banded-minhash guarantee (1-(1-J^r)^b;
    1-1e-14 at J=0.8 with 64/16) — and verification is exact Jaccard
    over the two text sources.

    Scale shape: one signature pass over the NEW corpus only, one
    co-partitioned bucket join (index side ships (id, band, bucket)
    residues — day-0 texts are read only for the candidates'
    verification join), distinct + exact verify. Bucket caps carry
    the visible ``truncated`` flag exactly like the in-corpus ops."""
    import os

    if on_truncate not in ("raise", "flag", "ignore"):
        raise ValueError(f"on_truncate must be raise|flag|ignore, got {on_truncate!r}")

    new_buckets = band_bucket_rows(ds, id_col, text_col, n_perm, bands)
    idx_buckets = rd.read_parquet(os.path.join(index_dir, "buckets"))

    def tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            # hive partition values surface as strings — normalize
            band = batch.column("band")
            if pa.types.is_string(band.type) or pa.types.is_large_string(
                band.type
            ):
                band = pc.cast(band, pa.int32())
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "band": pc.cast(band, pa.int32()),
                    "bucket": batch.column("bucket"),
                    "side": pa.array(
                        np.full(len(batch), side, dtype=np.int8)
                    ),
                }
            )

        return _t

    both = idx_buckets.map_batches(tag(0), batch_format="pyarrow").union(
        new_buckets.map_batches(tag(1), batch_format="pyarrow")
    )

    def emit_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=g[id_col].dtype),
                "id_b": pd.Series([], dtype=g[id_col].dtype),
                "truncated": pd.Series([], dtype="bool"),
            }
        )
        if g.empty:
            return empty
        g = g.drop_duplicates([id_col, "band", "bucket", "side"]).sort_values(
            id_col
        )
        rank = g.groupby(["band", "bucket", "side"], sort=False).cumcount()
        sizes = g.groupby(["band", "bucket", "side"], sort=False)[
            id_col
        ].transform("size")
        g = g.assign(__trunc=(sizes > max_bucket))[rank < max_bucket]
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        if a.empty or b.empty:
            return empty
        m = a.merge(b, on=["band", "bucket"], suffixes=("_a", "_b"))
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy(),
                "id_b": m[f"{id_col}_b"].to_numpy(),
                "truncated": (m["__trunc_a"] | m["__trunc_b"]).to_numpy(),
            }
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    pairs = partitioned_apply(both, ["band", "bucket"], emit_part)
    cand = distinct_pairs_keep_flag(pairs)
    cand = _apply_truncation_policy(cand, on_truncate, "near_dups_against_index")
    idx_texts = rd.read_parquet(os.path.join(index_dir, "texts"))
    return verify_jaccard_pairs(
        cand, idx_texts, id_col, text_col, threshold, ds_b=ds
    )
