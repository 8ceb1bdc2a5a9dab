"""Similarity search over an embedding column (``list<float>``).

- ``ann_brute_force``: exact cosine top-k. The query matrix is tiny →
  ``ray.put`` ONCE and read inside each task (broadcast, never
  re-shipped per batch); each batch computes a vectorized
  float64 matmul and keeps only its local top-k per query (combiner),
  so the shuffle moves ``O(queries × k × blocks)`` rows, never the
  corpus. Final per-query merge is a hash-partitioned vectorized
  top-k (no per-key dispatch — flat at any query count).
- ``ann_lsh_bucketed``: the scale path — random-hyperplane signatures
  (seeded, deterministic) bucket the corpus; each query searches only
  its own bucket (plus Hamming-1 neighbours), trading recall for a
  ~2^bits fan-in reduction. Partitioning assumption: bucket
  distribution is roughly balanced for mean-zero embeddings; skewed
  buckets are capped and the cap is reported.
"""

from __future__ import annotations

import hashlib
import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


def _merge_topk(partials: rd.Dataset, k: int, out_cols: list) -> rd.Dataset:
    """Per-query top-k merge WITHOUT per-key dispatch: one
    hash-partitioned shuffle, then a single vectorized
    sort + groupby.head + cumcount rank per partition — stays flat
    whether there are 10 queries or 10 million."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype="float64" if c == "score" else "int64")
                 for c in out_cols}
            )
        g = g.sort_values(
            ["query_id", "score", "vec_id"], ascending=[True, False, True]
        )
        g = g.groupby("query_id", sort=False).head(k).copy()
        g["rank"] = (g.groupby("query_id", sort=False).cumcount() + 1).astype("int64")
        return g[out_cols]

    return partitioned_apply(partials, ["query_id"], merge_part)


def ann_brute_force(
    emb: rd.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """Exact cosine top-k: (query_id, rank, vec_id, score) rows.

    Rank order is the total key (score desc, vec_id asc) so results
    are identical at any partitioning.
    """
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, qids = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        scores = m @ q.T  # (batch, nq)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for j in range(q.shape[0]):
            col = scores[:, j]
            # local top-k by (score desc, vec_id asc)
            order = np.lexsort((ids, -col))[:kk]
            out_q.extend([qids[j]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = emb.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )

    return _merge_topk(partials, k, ["query_id", "rank", "vec_id", "score"])


def load_queries(
    sf_dir_or_ds, n_queries: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """First ``n_queries`` embedding rows (by id) as the query matrix."""
    import os

    import pyarrow.parquet as pq

    if isinstance(sf_dir_or_ds, str):
        t = pq.read_table(
            os.path.join(sf_dir_or_ds, "embeddings.parquet"), columns=[id_col, emb_col]
        )
    else:
        t = sf_dir_or_ds
    df = t.to_pandas().sort_values(id_col).head(n_queries)
    mat = np.stack(df[emb_col].to_numpy()).astype(np.float64)
    return mat, df[id_col].to_numpy()


# ---------------------------------------------------------------------------
# LSH-bucketed scale path
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, seed: str = "ann-lsh") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (no RNG state)."""
    out = np.empty((bits, dim), dtype=np.float64)
    for b in range(bits):
        for base in range(0, dim, 8):
            d = hashlib.blake2b(f"{seed}:{b}:{base}".encode(), digest_size=64).digest()
            vals = np.frombuffer(d, dtype=np.uint64)[: min(8, dim - base)]
            out[b, base: base + len(vals)] = (
                vals.astype(np.float64) / float(1 << 64)
            ) * 2.0 - 1.0
    return out


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes.T) > 0.0
    powers = (1 << np.arange(planes.shape[0], dtype=np.int64))[None, :]
    return (signs.astype(np.int64) * powers).sum(axis=1)


def embedding_near_dups(
    emb: rd.Dataset,
    threshold: float = 0.95,
    bands: int = 4,
    bits_per_band: int = 12,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket: int = 2000,
) -> rd.Dataset:
    """(id_a, id_b, cosine, truncated) near-duplicate pairs via BANDED
    sign-LSH buckets.

    Each band is an independent set of ``bits_per_band`` hyperplanes;
    a pair is compared when it collides in ANY band, then deduped
    (distributed distinct — nothing driver-side). Banding is the
    recall lever: for a pair at angle θ a single ``b``-bit band
    catches it with p=(1-θ/π)^b, and missing all ``B`` bands has
    probability (1-p)^B — at the defaults (4×12) a 0.999-cosine pair
    is missed with p≈2e-6 while buckets stay 2^12-way split per band
    (the scale lever). Per-bucket work is one vectorized matmul and
    an ``np.argwhere`` of the thresholded upper triangle — never a
    Python double loop. Buckets capped at ``max_bucket`` ids emit
    pairs flagged ``truncated=True`` (visible, not silent).
    """
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_group_apply
    from vlm_ocr_doc_reader_ray.stages.dedup import distinct_pairs

    planes_holder: dict = {}

    def to_buckets(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, emb_col))
        if "planes" not in planes_holder:
            planes_holder["planes"] = [
                _hyperplanes(m.shape[1], bits_per_band, seed=f"near-dup-band{b}")
                for b in range(bands)
            ]
        parts = []
        n = len(batch)
        for band, planes in enumerate(planes_holder["planes"]):
            buckets = _bucket_of(m, planes)
            parts.append(
                pa.table(
                    {
                        id_col: batch.column(id_col),
                        "band": pa.array(np.full(n, band, dtype=np.int32)),
                        "bucket": pa.array(buckets, type=pa.int64()),
                        emb_col: batch.column(emb_col),
                    }
                )
            )
        return pa.concat_tables(parts)

    bucketed = emb.select_columns([id_col, emb_col]).map_batches(
        to_buckets, batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                    "truncated": pd.Series([], dtype="bool"),
                }
            )
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        truncated = len(ids) > max_bucket
        if truncated:
            ids = ids[:max_bucket]
            order = order[:max_bucket]
        m = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64)[order])
        sims = m @ m.T
        hits = np.argwhere(np.triu(sims >= threshold, 1))
        return pd.DataFrame(
            {
                "id_a": ids[hits[:, 0]].astype("int64"),
                "id_b": ids[hits[:, 1]].astype("int64"),
                "cosine": sims[hits[:, 0], hits[:, 1]].astype("float64"),
                "truncated": np.full(len(hits), truncated, dtype=bool),
            }
        )

    all_pairs = partitioned_group_apply(bucketed, ["band", "bucket"], pairs)
    # a pair can collide in several bands; distributed pair-distinct
    # (cosine is identical from any band — pure fn of the two vectors)
    return distinct_pairs(all_pairs, ["id_a", "id_b"])


def fixed_codebook(dim: int, k: int = 16, seed: str = "ivf-codebook") -> np.ndarray:
    """Deterministic, data-independent coarse quantizer: ``k``
    normalized pseudo-random centroids (same construction as the LSH
    hyperplanes). Lets the DuckDB oracle recompute cell assignment
    from interpolated literals; for production quality use
    :func:`train_centroids` on a corpus sample instead — the
    partition/search structure is identical."""
    return _normalize(_hyperplanes(dim, k, seed=seed))


def train_centroids(
    sample: np.ndarray, k: int = 16, iters: int = 8
) -> np.ndarray:
    """Deterministic spherical k-means on an in-memory SAMPLE
    (FAISS-style IVF training: the codebook trains on a tiny fixed
    sample — here the first rows by id — while assignment and search
    stay fully distributed). Pure numpy, fixed iteration count, first
    ``k`` rows as init → bit-identical centroids every run."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    cents = x[:k].copy()
    for _ in range(iters):
        cells = np.argmax(x @ cents.T, axis=1)
        for j in range(k):
            members = x[cells == j]
            if len(members):
                cents[j] = members.sum(axis=0)
        cents = _normalize(cents)
    return cents


def _probe_sets(qn: np.ndarray, cn: np.ndarray, nprobe: int) -> list:
    """``nprobe`` nearest cells per (normalized) query: dot desc,
    cell index asc tie-break — the one assignment rule shared by
    search, index build and the SQL oracle."""
    qdots = qn @ cn.T
    nc = cn.shape[0]
    out = []
    for j in range(qn.shape[0]):
        order = np.lexsort((np.arange(nc), -qdots[j]))[: min(nprobe, nc)]
        out.append(frozenset(int(c) for c in order))
    return out


def build_ivf_index(
    emb: rd.Dataset,
    centroids: np.ndarray,
    index_dir: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Persist the IVF inverted file: ``(vec_id, embedding)`` parquet
    PARTITIONED BY ``cell`` (hive layout, one directory per cell).

    The write-once half of a FAISS-style IVF index: assignment is one
    broadcast-centroid matmul per batch, and the partitioned layout
    lets :func:`ann_ivf_indexed` open only the probed cells' files —
    repeated queries never rescan the corpus."""
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cn)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        m = _normalize(_batch_matrix(batch, emb_col))
        cells = np.argmax(m @ cents.T, axis=1)
        return pa.table(
            {
                "vec_id": batch.column(id_col),
                "embedding": batch.column(emb_col),
                "cell": pa.array(cells, type=pa.int64()),
            }
        )

    emb.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["cell"])


def ann_ivf_indexed(
    index_dir: str,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
) -> rd.Dataset:
    """IVF top-k over a PERSISTED index (:func:`build_ivf_index`):
    path-level partition pruning reads only the union of the queries'
    ``nprobe`` probed cells — scan bytes drop ~``nprobe/k_cells`` vs
    the recompute path (:func:`ann_ivf`), measured via
    ``input_files()``. Same assignment rule, bit-identical results."""
    from ray.data.datasource.partitioning import PathPartitionFilter

    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe_sets = _probe_sets(qn, cn, nprobe)
    probed_union = {str(c) for s in probe_sets for c in s}

    pf = PathPartitionFilter.of(
        lambda kv: kv.get("cell") in probed_union, style="hive"
    )
    pruned = rd.read_parquet(index_dir, partition_filter=pf)
    q_ref = ray.put((qn, np.asarray(query_ids), probe_sets))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, qids, probes = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, "embedding"))
        ids = batch.column("vec_id").to_numpy()
        # hive partition values surface as strings
        cells = np.asarray(
            [int(c) for c in batch.column("cell").to_pylist()], dtype=np.int64
        )
        out_q, out_v, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(cells, list(probes[j]))
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = m[mask] @ q[j]
            order = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            out_q.extend([qids[j]] * len(order))
            out_v.extend(sub_ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = pruned.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(partials, k, ["query_id", "rank", "vec_id"])


def ann_ivf(
    emb: rd.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """IVF-style approximate top-k: vectors are assigned to their
    max-cosine centroid cell; each query scans only its ``nprobe``
    nearest cells.

    The inverted-file analogue of :func:`ann_lsh_bucketed`: centroids
    are broadcast once (``ray.put``), assignment is one vectorized
    matmul per batch, each batch keeps its local top-k among probed
    rows (combiner), and the per-query merge handles ≤ k×blocks rows.
    At corpus scale the cell column would be written once and reused
    (partition-by-cell), exactly like a FAISS IVF index."""
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe_sets = _probe_sets(qn, cn, nprobe)
    q_ref = ray.put((qn, np.asarray(query_ids), cn, probe_sets))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, qids, cents, probes = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy()
        cells = np.argmax(m @ cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(cells, list(probes[j]))
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = m[mask] @ q[j]
            order = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            out_q.extend([qids[j]] * len(order))
            out_v.extend(sub_ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = emb.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )

    import pandas as pd

    return _merge_topk(partials, k, ["query_id", "rank", "vec_id"])


def ann_lsh_bucketed(
    emb: rd.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    bits: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """Approximate top-k: each query scans only its sign-bucket.

    Same output schema as ``ann_brute_force`` (+``bucket``); recall<1
    by design — documented scale path, verified in tests against the
    brute-force baseline for overlap, not equality."""
    qraw = np.asarray(query_matrix, dtype=np.float64)
    qn = _normalize(qraw)
    planes = _hyperplanes(qn.shape[1], bits)
    # bucket signs come from the RAW dot product — mathematically the
    # same sign as the normalized dot (the norm is a positive factor)
    # but numerically the same EXPRESSION the SQL oracle evaluates, so
    # the normalization rounding layer can't flip a near-zero sign
    q_buckets = _bucket_of(qraw, planes)
    q_ref = ray.put((qn, np.asarray(query_ids), q_buckets, planes))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, qids, qb, pl = ray.get(q_ref)
        raw = _batch_matrix(batch, emb_col)
        m = _normalize(raw)
        ids = batch.column(id_col).to_numpy()
        buckets = _bucket_of(raw, pl)
        out_q, out_v, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = buckets == qb[j]
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = m[mask] @ q[j]
            order = np.lexsort((sub_ids, -col))[: min(k, len(sub_ids))]
            out_q.extend([qids[j]] * len(order))
            out_v.extend(sub_ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = emb.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )

    return _merge_topk(partials, k, ["query_id", "rank", "vec_id", "score"])


def grouped_centroids(
    ds: rd.Dataset,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Per-group mean embedding (class/domain centroids) — the
    "domain embedding" aggregate of a curation pipeline, exact and
    order-independent at any parallelism.

    Float summation is not associative, so a naive distributed sum of
    float32 vectors hashes differently per block layout. Each
    component is therefore quantized once (``floor(v*scale + 0.5)``,
    int64 — the engine's established exact-float convention) and
    summed as INTEGERS: per batch a vectorized matrix reduction
    collapses to ``groups × dim`` residue rows, the global sum is a
    pre-aggregated groupby, and the mean divides back out at the end
    with one fixed expression (``s / scale / n``). Output: one
    ``(label, idx, mean)`` row per group × dimension (bounded by
    groups × dim, never by data)."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"label": pd.Series([], dtype="int64"),
                 "idx": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        m = _batch_matrix(batch, vec_col)
        q = np.floor(m * scale + 0.5).astype(np.int64)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        dim = m.shape[1] if len(m) else 0
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k = len(uniq)
        return pd.DataFrame(
            {
                "label": np.repeat(uniq, dim),
                "idx": np.tile(np.arange(1, dim + 1, dtype=np.int64), k),
                "s": sums.reshape(-1),
                "n": np.repeat(counts, dim),
            }
        )

    partials = ds.select_columns([label_col, vec_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    totals = grouped_sums(partials, ["label", "idx"], ["s", "n"])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["label", "idx"]].copy()
        out["mean"] = (
            g["s"].to_numpy(dtype="float64") / scale / g["n"].to_numpy(dtype="float64")
        )
        return out

    return totals.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# distributed k-means (Lloyd's) over the FULL corpus
# --------------------------------------------------------------------------

def _lloyd_pass(
    ds: rd.Dataset,
    cents: dict,
    vec_col: str,
    scale: int,
) -> dict:
    """One streaming Lloyd iteration: assign every vector to its
    nearest centroid and return the new per-cluster means.

    Scale shape: centroids are broadcast ONCE (``ray.put``), each batch
    collapses to ``clusters × dim`` integer residue rows (the
    :func:`grouped_centroids` quantization convention — int64 sums are
    associative, so the distributed mean is bit-exact at any
    partitioning), the global combine is a pre-aggregated
    ``grouped_sums`` over those residues, and only the bounded
    ``k × dim`` result ever reaches the driver. The corpus itself is
    never materialized; each iteration is one streaming pass.

    Exactness bound (documented contract): a cluster's quantized
    component sum must stay below 2^53 to round-trip through float64 —
    ``count_per_cluster × scale × max|v| < 2^53``. At 1e6 scale and
    unit-norm vectors that allows ~9e9 rows per cluster; shrink
    ``scale`` for larger clusters.

    Empty clusters are DROPPED (not re-seeded): the SQL mirror's
    per-iteration GROUP BY loses them naturally, so the engine must
    too. Cluster indices keep their init positions.
    """
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    idxs = np.array(sorted(cents), dtype=np.int64)
    mat = np.stack([cents[int(i)] for i in idxs]).astype(np.float64)
    cn = (mat * mat).sum(axis=1)
    ref = ray.put((idxs, mat, cn))

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"c": pd.Series([], dtype="int64"),
                 "i": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        b_idxs, b_mat, b_cn = ray.get(ref)
        m = _batch_matrix(batch, vec_col)
        # squared-L2 argmin == argmax of 2*x.c - |c|^2 (|x|^2 common);
        # np.argmax takes the FIRST max == smallest cluster index,
        # mirrored in SQL by ORDER BY score DESC, c ASC.
        scores = 2.0 * (m @ b_mat.T) - b_cn
        a = np.argmax(scores, axis=1)
        q = np.floor(m * scale + 0.5).astype(np.int64)
        uniq, inv = np.unique(a, return_inverse=True)
        dim = m.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {
                "c": np.repeat(b_idxs[uniq], dim),
                "i": np.tile(np.arange(dim, dtype=np.int64), len(uniq)),
                "s": sums.reshape(-1),
                "n": np.repeat(counts, dim),
            }
        )

    residues = ds.select_columns([vec_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    totals = grouped_sums(residues, ["c", "i"], ["s", "n"]).to_pandas()
    new: dict = {}
    for cidx, g in totals.groupby("c"):
        g = g.sort_values("i")
        new[int(cidx)] = (
            g["s"].to_numpy(dtype=np.float64) / scale / g["n"].to_numpy(dtype=np.float64)
        )
    return new


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 10,
    iters: int = 3,
    vec_col: str = "embedding",
    init: np.ndarray | None = None,
    scale: int = 1_000_000,
    seed: str = "kmeans-init",
) -> dict:
    """Distributed Lloyd's k-means over the FULL dataset (unlike
    :func:`train_centroids`, which fits an in-memory sample for IVF
    codebooks). ``iters`` fixed assignment+update passes from a
    deterministic data-independent init (:func:`fixed_codebook`), so
    the result is reproducible and SQL-mirrorable (the DuckDB oracle
    unrolls the same iterations from the same centroid literals).

    Returns ``{cluster_index: centroid}`` (float64 arrays); indices
    are init positions, emptied clusters are dropped. Each iteration
    re-reads the (column-pruned) input — at 100 TB that is ``iters``
    streaming passes, never a corpus pin.
    """
    if init is None:
        first = ds.select_columns([vec_col]).take(1)
        dim = len(first[0][vec_col])
        init = fixed_codebook(dim, k, seed=seed)
    cents = {i: np.asarray(init[i], dtype=np.float64) for i in range(len(init))}
    for _ in range(iters):
        cents = _lloyd_pass(ds, cents, vec_col, scale)
    return cents


def kmeans_assign(
    ds: rd.Dataset,
    cents: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "cluster",
) -> rd.Dataset:
    """Tag every vector with its nearest centroid (one broadcast, one
    streaming pass): ``(id_col, out_col)`` rows."""
    idxs = np.array(sorted(cents), dtype=np.int64)
    mat = np.stack([cents[int(i)] for i in idxs]).astype(np.float64)
    cn = (mat * mat).sum(axis=1)
    ref = ray.put((idxs, mat, cn))

    def tag(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 out_col: pa.array([], type=pa.int64())}
            )
        b_idxs, b_mat, b_cn = ray.get(ref)
        m = _batch_matrix(batch, vec_col)
        a = np.argmax(2.0 * (m @ b_mat.T) - b_cn, axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                out_col: pa.array(b_idxs[a], type=pa.int64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )


def kmeans_medoids(
    ds: rd.Dataset,
    cents: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "pd.DataFrame":
    """Per-cluster representative selection (the SemDeDup/prototype
    step): for every cluster, the member CLOSEST to its centroid
    (max ``2x·c - |c|²`` == min L2, ties → smallest id) plus the exact
    cluster size. One streaming pass: each batch emits at most one
    ``(cluster, id, score, n)`` candidate row per cluster (bounded by
    ``k × blocks``), the driver reduces those residues with one
    deterministic sort. Scores are computed from the SAME broadcast
    centroid matrix in every batch, so cross-batch comparison is
    total-ordered; the best-vs-second gap is ~1e-4 on this corpus
    (pinned by test) vs ~1e-15 dot-product noise."""
    import pandas as pd

    idxs = np.array(sorted(cents), dtype=np.int64)
    mat = np.stack([cents[int(i)] for i in idxs]).astype(np.float64)
    cn = (mat * mat).sum(axis=1)
    ref = ray.put((idxs, mat, cn))

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"c": pd.Series([], dtype="int64"),
                 "vid": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64"),
                 "n": pd.Series([], dtype="int64")}
            )
        b_idxs, b_mat, b_cn = ray.get(ref)
        m = _batch_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        scores = 2.0 * (m @ b_mat.T) - b_cn
        a = np.argmax(scores, axis=1)
        df = pd.DataFrame(
            {"c": b_idxs[a], "vid": ids.astype(np.int64),
             "score": scores[np.arange(len(a)), a]}
        )
        sizes = df.groupby("c").size()
        best = df.sort_values(
            ["c", "score", "vid"], ascending=[True, False, True]
        ).groupby("c", sort=True).first().reset_index()
        best["n"] = best["c"].map(sizes).astype("int64")
        return best[["c", "vid", "score", "n"]]

    residues = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    sizes = residues.groupby("c")["n"].sum()
    best = residues.sort_values(
        ["c", "score", "vid"], ascending=[True, False, True]
    ).groupby("c", sort=True).first().reset_index()
    return pd.DataFrame(
        {
            "cluster": best["c"].astype("int64"),
            "medoid_id": best["vid"].astype("int64"),
            "size": best["c"].map(sizes).astype("int64"),
        }
    )


def semantic_dedup_pairs(
    ds: rd.Dataset,
    cents: dict,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """SemDeDup-shape near-duplicate pairs: k-means clusters bound the
    pairwise search — cosine is computed only WITHIN a cluster
    (O(Σ cluster²) vs O(n²) all-pairs), the standard scale path for
    embedding dedup. Pairs whose twins straddle a Voronoi boundary are
    (by design, and identically in the SQL mirror) not compared — the
    documented SemDeDup recall trade; this corpus' twins sit ~0.01
    apart vs ≥3e-6 assignment margins, so recall is pinned by test.

    One tagging pass adds the cluster id; clusters then co-locate via
    the engine's hash-partitioned apply and each cluster runs one
    vectorized normalized matmul. Output: (id_a, id_b), id_a < id_b.
    """
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_group_apply

    idxs = np.array(sorted(cents), dtype=np.int64)
    mat = np.stack([cents[int(i)] for i in idxs]).astype(np.float64)
    cn = (mat * mat).sum(axis=1)
    ref = ray.put((idxs, mat, cn))

    def tag(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("cluster", pa.array([], type=pa.int64()))
        b_idxs, b_mat, b_cn = ray.get(ref)
        m = _batch_matrix(batch, vec_col)
        a = np.argmax(2.0 * (m @ b_mat.T) - b_cn, axis=1)
        return batch.append_column("cluster", pa.array(b_idxs[a], type=pa.int64()))

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64")}
            )
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in g[vec_col]]))
        sim = m @ m.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sim[ia, ib] >= threshold
        ids = g[id_col].to_numpy()
        return pd.DataFrame(
            {"id_a": ids[ia[keep]].astype("int64"),
             "id_b": ids[ib[keep]].astype("int64")}
        )

    return partitioned_group_apply(tagged, ["cluster"], pairs)


def ann_recall_report(
    ds,
    query_mat,
    query_ids,
    centroids,
    k: int = 5,
    nprobe: int = 4,
):
    """Recall@k evaluation of the IVF approximate path against the
    brute-force exact path — the measurement harness every ANN
    deployment needs before trading exactness for probe count:
    per query, how many of the true top-``k`` the IVF search with
    ``nprobe`` probes recovered. → (query_id, n_hits, recall_ppm),
    half-up integer ppm.

    Scale shape: both searches stream the corpus with local top-k
    (k × blocks candidate rows, never all-pairs); the comparison
    joins two k·|queries|-row results — bounded, so the final merge
    is a driver-side pandas join (annotated: ≤ k·|queries| rows per
    side)."""
    import pandas as pd

    brute = ann_brute_force(ds, query_mat, query_ids, k=k).select_columns(
        ["query_id", "vec_id"]
    ).to_pandas()
    approx = ann_ivf(
        ds, query_mat, query_ids, centroids=centroids, k=k, nprobe=nprobe
    ).select_columns(["query_id", "vec_id"]).to_pandas()
    hit = brute.merge(approx, on=["query_id", "vec_id"])
    n_hits = (
        hit.groupby("query_id").size()
        .reindex(sorted(set(query_ids)), fill_value=0)
    )
    out = pd.DataFrame(
        {
            "query_id": n_hits.index.astype("int64"),
            "n_hits": n_hits.to_numpy().astype("int64"),
        }
    )
    out["recall_ppm"] = (
        (out["n_hits"] * 2_000_000 + k) // (2 * k)
    ).astype("int64")
    import ray.data as rd

    return rd.from_pandas(out)
