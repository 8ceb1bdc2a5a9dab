"""Relational layer: broadcast join, partitioned hash join, top-k,
windowed aggregates.

These are the engine's generic wide operators, exercised over the
TPC-H-style tables. Money/quantity aggregates are computed in integer
cents (``round(x*100)`` before summing) in BOTH the Ray pipelines and
the SQL oracles: integer sums are exact and associative, so results
are bit-identical at any partitioning — float sums would differ in
the last ulp depending on reduction order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from vlm_ocr_doc_reader_ray.stages.aggregates import (
    grouped_sums,
    silence_empty_block_size_warnings,
)


def cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """floor(x*100 + 0.5) → int64, the exact-sum representation.

    floor(+0.5) rather than round(): pyarrow rounds half-to-even while
    SQL rounds half-away — floor(+0.5) is bit-identical in both."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


def broadcast_join(
    left: rd.Dataset,
    right_df: pd.DataFrame,
    on: str,
    how: str = "inner",
) -> rd.Dataset:
    """Join a Dataset against a SMALL pandas side: ``ray.put`` once,
    pandas merge per batch. No shuffle (SURVEY §2.4: the registry→page
    lookup J1 at corpus scale)."""
    ref = ray.put(right_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return left.map_batches(merge, batch_format="pandas")


def _schema_dtypes(ds: rd.Dataset) -> dict:
    """Expected pandas dtype per column of ``ds`` (from plan metadata
    only — never executes the dataset)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.empty_table().to_pandas().dtypes.to_dict()
    try:  # PandasBlockSchema: names + numpy dtypes
        return dict(zip(sch.names, base.types))
    except Exception:
        return {}


def _restore_dtypes(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
    """Cast columns back to their source-side dtypes after a padded
    union widened them (best-effort: genuinely-null data keeps its
    widened dtype rather than erroring)."""
    for c, dt in dtypes.items():
        if c in df.columns and df[c].dtype != dt:
            try:
                df[c] = df[c].astype(dt)
            except (ValueError, TypeError):
                pass
    return df


def partitioned_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
    salt: dict | None = None,
) -> rd.Dataset:
    """Large⋈large equi-join: explicit bucketed hash join.

    Both sides gain ``__bucket = key % B`` (for integer keys; a stable
    hash otherwise), are grouped per bucket, and matching buckets join
    pairwise inside ``map_groups``. B fixes reducer fan-in;
    partitioning assumption: key hash is roughly uniform — UNLESS hot
    keys are declared in ``salt``.

    ``salt`` maps hot key values → fan-out n: left rows carrying a hot
    key are spread over ``n`` sub-buckets (round-robin within each
    batch — any spread is correct, only co-location of the PAIR
    matters), and right rows carrying it are REPLICATED into all ``n``
    sub-buckets, so no single reducer sees the whole hot key. The
    classic skew-join recipe; results are identical to the unsalted
    join (pytest-pinned)."""
    salt = salt or {}
    max_salt = max(salt.values(), default=1)

    def _base_buckets(key: pa.ChunkedArray | pa.Array) -> "np.ndarray":
        if pa.types.is_integer(key.type):
            return (
                pc.cast(key, pa.int64()).to_numpy(zero_copy_only=False) % num_buckets
            )
        # pd.util.hash_pandas_object: vectorized AND process-stable
        # (the same device as bloom_filter_join below) — any
        # deterministic hash bucketing is correct as long as both
        # sides use the same one; the per-row blake2b loop this
        # replaces was the hot spot of string-keyed joins.
        import pandas as pd

        h = pd.util.hash_pandas_object(
            pd.Series(key.to_pandas()), index=False
        ).to_numpy()
        return (h % np.uint64(num_buckets)).astype(np.int64)

    def tag_left(batch: pa.Table) -> pa.Table:
        key = batch.column(left_on)
        b = _base_buckets(key)
        if salt:
            vals = key.to_pylist()
            salts = np.zeros(len(vals), dtype=np.int64)
            counters: dict = {}
            for i, v in enumerate(vals):
                n = salt.get(v)
                if n:
                    c = counters.get(v, 0)
                    salts[i] = c % n
                    counters[v] = c + 1
            b = b * max_salt + salts
        return batch.append_column("__bucket", pa.array(b, type=pa.int64()))

    def tag_right(batch: pa.Table) -> pa.Table:
        key = batch.column(right_on)
        b = _base_buckets(key)
        if not salt:
            return batch.append_column("__bucket", pa.array(b, type=pa.int64()))
        vals = key.to_pylist()
        hot_idx = [i for i, v in enumerate(vals) if v in salt]
        cold_mask = np.ones(len(vals), dtype=bool)
        cold_mask[hot_idx] = False
        parts = [
            batch.filter(pa.array(cold_mask)).append_column(
                "__bucket", pa.array(b[cold_mask] * max_salt, type=pa.int64())
            )
        ]
        for i in hot_idx:
            n = salt[vals[i]]
            row = batch.slice(i, 1)
            for s in range(n):
                parts.append(
                    row.append_column(
                        "__bucket",
                        pa.array([b[i] * max_salt + s], type=pa.int64()),
                    )
                )
        return pa.concat_tables(parts)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    # side-tag, pad to a common schema, then union: ONE shuffle
    # co-partitions both sides by bucket
    l_cols = [c for c in left.schema().names]
    r_cols = [c for c in right.schema().names]
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def pad(side: str):
        def _pad(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            for c in all_cols:
                if c not in df.columns:
                    df[c] = None
            return df[all_cols + ["__bucket", "__side"]]

        return _pad

    both = lt.map_batches(pad("l"), batch_format="pandas").union(
        rt.map_batches(pad("r"), batch_format="pandas")
    )

    # expected pandas dtypes per side: the union mixes one side's real
    # values with the other side's None padding in the same column, so
    # a group frame's int columns arrive as float/object — restore
    # them after un-padding
    l_dtypes = _schema_dtypes(left)
    r_dtypes = _schema_dtypes(right)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # un-pad by EXPLICIT column list per side (never dropna: a
        # genuine data column that is all-null within one bucket would
        # vanish and make that bucket's output schema diverge)
        lg = _restore_dtypes(g[g["__side"] == "l"][l_cols].copy(), l_dtypes)
        rg = _restore_dtypes(g[g["__side"] == "r"][r_cols].copy(), r_dtypes)
        if lg.empty or rg.empty:
            # schema-stable empty block: the merge of the two TYPED
            # empty frames, never a column-less DataFrame (which would
            # trip the executor's schema-mismatch warning downstream)
            return lg.head(0).merge(
                rg.head(0), left_on=left_on, right_on=right_on, how="inner"
            )
        return lg.merge(rg, left_on=left_on, right_on=right_on, how="inner")

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def native_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    num_partitions: int = 16,
    join_type: str = "inner",
) -> rd.Dataset:
    """Ray's built-in hash-partitioned ``Dataset.join`` (available in
    this Ray version) — the library alternative to
    :func:`partitioned_hash_join`; both are exposed so pipelines can
    pick per workload (the explicit variant allows salting hot keys,
    the native one fuses better). ``join_type`` passes through to
    Ray (``inner`` / ``left_outer`` / ...).

    Both sides are swept for empty blocks first. ``map_groups`` (any
    ``partitioned_apply`` output) legitimately emits ZERO-COLUMN empty
    pandas blocks for empty hash partitions, and Ray's join broadcasts
    schemas to its aggregators from the FIRST bundle it receives per
    side — if that bundle is one of the zero-column blocks, every
    row-less join partition gets a schema-less table and acero's
    ``FieldRef.Name(key)`` resolution fails ("No match or multiple
    matches for key field reference"). A plain per-block sweep
    (``batch_size=None``) cannot fix this: Ray passes empty blocks
    through ``map_batches`` WITHOUT calling the UDF. A row-count
    ``batch_size`` does fix it: the task bundler coalesces empty
    blocks into the same bundle as their schema-ful neighbors (an
    empty block adds 0 rows, so the bundler keeps accumulating), the
    UDF sees one schema-ful batch, and the empties vanish from the
    stream. Zero-copy views, no shuffle — one pipelined pass over
    data the join reads anyway."""

    def _drop_empty(t: "pa.Table"):
        if t.num_rows:
            yield t

    left = left.map_batches(
        _drop_empty, batch_size=32768, batch_format="pyarrow", zero_copy_batch=True
    )
    right = right.map_batches(
        _drop_empty, batch_size=32768, batch_format="pyarrow", zero_copy_batch=True
    )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(left_on,),
        right_on=(right_on,),
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    num_parts: int = 32,
    allow_exact: bool = True,
) -> rd.Dataset:
    """Keyed as-of join: for each left row, the right row with the
    same key and the closest ``right_ts`` <= ``left_ts`` (backward
    direction; the classic events→latest-dimension-version lookup).
    ``direction="forward"`` flips to the closest ``right_ts`` >=
    ``left_ts`` (next-event attribution); ``allow_exact=False`` makes
    either bound strict — DuckDB's ``ASOF JOIN ON l.ts < r.ts``.

    Ray Data has no asof join; this composes one from primitives: one
    hash-partitioned shuffle co-locates both sides by key, then each
    partition runs a single vectorized ``pd.merge_asof`` over its
    ts-sorted rows (``by=`` handles the per-key matching inside
    pandas at C speed — no per-key dispatch). Inner semantics:
    left rows with no preceding right row are dropped, like SQL
    ``ASOF JOIN``. Determinism caveat (same as SQL): ties on
    (key, right_ts) are arbitrary — pre-reduce the right side to one
    row per (key, ts) first."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def pad(side: str, my_cols, key_col):
        def _pad(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            df["__key"] = df[key_col]
            for c in all_cols:
                if c not in df.columns:
                    df[c] = None
            return df[all_cols + ["__side", "__key"]]

        return _pad

    both = left.map_batches(pad("l", l_cols, left_on), batch_format="pandas").union(
        right.map_batches(pad("r", r_cols, right_on), batch_format="pandas")
    )

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][l_cols]
        rg = g[g["__side"] == "r"][r_cols]
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=all_cols)
        r_dtypes = rg.dtypes.to_dict()
        l_dtypes = lg.dtypes.to_dict()
        # arrow roundtrips give mixed datetime resolutions (us vs s):
        # merge on a common ns resolution, restore dtypes after
        if lg[left_ts].dtype != rg[right_ts].dtype:
            lg = lg.assign(**{left_ts: lg[left_ts].astype("datetime64[ns]")})
            rg = rg.assign(**{right_ts: rg[right_ts].astype("datetime64[ns]")})
        out = pd.merge_asof(
            lg.sort_values(left_ts, kind="mergesort"),
            rg.sort_values(right_ts, kind="mergesort"),
            left_on=left_ts,
            right_on=right_ts,
            left_by=left_on,
            right_by=right_on,
            direction=direction,
            allow_exact_matches=allow_exact,
        )
        probe = right_ts if right_ts != left_ts else right_on
        out = out.dropna(subset=[probe])
        # NaN-padding upcast int right columns to float, and the ts
        # normalization changed resolutions: restore original dtypes
        for c, dt in {**l_dtypes, **r_dtypes}.items():
            if c in out.columns and out[c].dtype != dt:
                out[c] = out[c].astype(dt)
        return out[all_cols]

    return partitioned_apply(both, ["__key"], join_part, num_parts=num_parts)


def band_join(
    ds: rd.Dataset,
    value_col: str,
    bands: pd.DataFrame,
    band_col: str = "band",
) -> rd.Dataset:
    """Range (interval) join against a SMALL side of half-open bands
    ``[lo, hi)``: each row gains the ``band_col`` label of the band
    containing ``value_col``; rows in no band are dropped (inner).

    The broadcast form of a range join: the band table is sorted once,
    shipped once (``ray.put``), and each batch resolves membership
    with ONE vectorized ``np.searchsorted`` — never a per-row scan,
    never a shuffle, never the O(n·m) inequality cross-join a naive
    range join degenerates into. Requires non-overlapping bands
    (asserted); ``hi=None``/inf means unbounded above."""
    b = bands.sort_values("lo", ignore_index=True)
    los = b["lo"].to_numpy(dtype=np.float64)
    his = b["hi"].fillna(np.inf).to_numpy(dtype=np.float64)
    assert (his[:-1] <= los[1:]).all() if len(b) > 1 else True, "overlapping bands"
    labels = b[band_col].to_numpy()
    ref = ray.put((los, his, labels))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        lo_arr, hi_arr, labs = ray.get(ref)
        x = batch[value_col].to_numpy(dtype=np.float64)
        idx = np.searchsorted(lo_arr, x, side="right") - 1
        ok = (idx >= 0) & (x < hi_arr[np.clip(idx, 0, len(hi_arr) - 1)])
        out = batch[ok].copy()
        out[band_col] = labs[idx[ok]]
        return out

    return ds.map_batches(tag, batch_format="pandas")


def top_k(ds: rd.Dataset, by: str, k: int, tie_break: str) -> rd.Dataset:
    """Global top-k with a total ordering key (by desc, tie asc).

    Combiner: each batch keeps its local k, the final merge handles
    ≤ k×blocks rows — never a global sort."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values([by, tie_break], ascending=[False, True]).head(k)

    partials = ds.map_batches(local, batch_format="pandas")
    merged = partials.repartition(1).map_batches(
        lambda df: df.sort_values([by, tie_break], ascending=[False, True]).head(k),
        batch_format="pandas",
        batch_size=None,
    )
    return merged


def sliding_window_agg(
    events: rd.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 7200,
    slide_s: int = 3600,
) -> rd.Dataset:
    """Sliding event-time windows (size ``window_s``, step ``slide_s``).

    Each event is replicated into the ``window_s/slide_s`` windows
    containing it inside ``map_batches`` (no shuffle for the fan-out),
    then aggregated like a tumbling window. Windows start at multiples
    of the slide."""
    k = window_s // slide_s

    def project(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(batch.column(ts_col), pa.int64()), 1_000_000)
        base = pc.multiply(
            pc.cast(
                pc.floor(pc.divide(pc.cast(epoch, pa.float64()), float(slide_s))),
                pa.int64(),
            ),
            slide_s,
        )
        vals = cents(batch.column(value_col))
        keys = batch.column(key_col)
        parts = []
        for i in range(k):
            ws = pc.subtract(base, i * slide_s)
            parts.append(
                pa.table(
                    {key_col: keys, "window_start_s": ws, "value_cents": vals}
                )
            )
        return pa.concat_tables(parts)

    projected = events.map_batches(project, batch_format="pyarrow")
    return grouped_sums(
        projected, [key_col, "window_start_s"], ["value_cents"], count_alias="n_events"
    )


def session_window_agg(
    events: rd.Dataset,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
) -> rd.Dataset:
    """Session windows per key (sessions split at gaps > ``gap_s``).

    Sessionization is per-key-ordered, but it does NOT need per-key
    dispatch: one hash-partitioned shuffle co-locates each key, then
    the whole partition is sessionized in a single vectorized pass —
    sort by (key, ts), flag rows where the key changes or the gap
    exceeds ``gap_s``, cumsum the flags into session ids, and a pandas
    groupby aggregate (C-speed hash agg) emits
    (key, session_start_s, n_events, duration_s)."""
    import numpy as np

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                "epoch_s": pc.divide(pc.cast(batch.column(ts_col), pa.int64()), 1_000_000),
            }
        )

    projected = events.map_batches(project, batch_format="pyarrow")

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=g[key_col].dtype),
                    "session_start_s": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "duration_s": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values([key_col, "epoch_s"], kind="mergesort")
        keys = g[key_col].to_numpy()
        ts = g["epoch_s"].to_numpy()
        new_key = np.concatenate([[True], keys[1:] != keys[:-1]])
        gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_s])
        sid = np.cumsum(new_key | gap)
        agg = (
            pd.DataFrame({key_col: keys, "t": ts, "sid": sid})
            .groupby("sid", sort=False)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start_s": ("t", "min"),
                    "n_events": ("t", "count"),
                    "t_max": ("t", "max"),
                }
            )
        )
        agg["duration_s"] = (agg["t_max"] - agg["session_start_s"]).astype("int64")
        agg["session_start_s"] = agg["session_start_s"].astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg[
            [key_col, "session_start_s", "n_events", "duration_s"]
        ].reset_index(drop=True)

    return partitioned_apply(projected, [key_col], sessions_part)


def grouped_top_k(
    ds: rd.Dataset, key_col: str, by: str, k: int, tie_break: str
) -> rd.Dataset:
    """Top-k rows per key by (by desc, tie asc): per-batch local top-k
    combiner, then a hash-partitioned merge (shuffle carries ≤
    k×blocks rows per key; the merge is one vectorized
    sort + groupby.head per partition, never per-key dispatch)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values([by, tie_break], ascending=[False, True])
            .groupby(key_col, sort=False)
            .head(k)
        )

    partials = ds.map_batches(local, batch_format="pandas")
    return partitioned_apply(partials, [key_col], local)


def broadcast_anti_join(
    left: rd.Dataset, right_keys, left_on: str
) -> rd.Dataset:
    """Rows of ``left`` whose key does NOT appear in ``right_keys``
    (small side broadcast via ray.put — the semi/anti-join pattern;
    for huge key sets use :func:`bloom_anti_join`, same shape)."""
    import ray

    ref = ray.put(set(right_keys))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_size_warnings()
        keys = ray.get(ref)
        return batch[~batch[left_on].isin(keys)]

    return left.map_batches(keep, batch_format="pandas")


class BloomFilter:
    """Deterministic Bloom filter over int64/string keys.

    ``k`` hash functions are derived from two blake2b-seeded base
    hashes (double hashing — Kirsch–Mitzenmacher), so membership bits
    are identical in every process at any parallelism. ~10 bits/key
    at the default sizing → ~1% false-positive rate.
    """

    def __init__(self, n_items: int, bits_per_key: int = 10, k: int = 7) -> None:
        self.m = max(64, int(n_items * bits_per_key))
        self.k = k
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    @staticmethod
    def _base_hashes(keys) -> tuple[np.ndarray, np.ndarray]:
        # pd.util.hash_pandas_object is vectorized AND process-stable
        # (fixed internal key, independent of PYTHONHASHSEED); two
        # distinct hash_keys give the two independent base hashes
        s = pd.Series(keys)
        h1 = pd.util.hash_pandas_object(
            s, index=False, hash_key="bloom-filter-h01"
        ).to_numpy()
        h2 = pd.util.hash_pandas_object(
            s, index=False, hash_key="bloom-filter-h02"
        ).to_numpy() | np.uint64(1)
        return h1, h2

    def _positions(self, keys) -> np.ndarray:
        h1, h2 = self._base_hashes(keys)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_many(self, keys) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def might_contain(self, keys) -> np.ndarray:
        """Vectorized membership: True ⇒ maybe present (FP ~1%);
        False ⇒ DEFINITELY absent."""
        pos = self._positions(keys)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)


def bloom_anti_join(
    left: rd.Dataset, right_keys, left_on: str, exact: bool = True
) -> rd.Dataset:
    """Anti-join via a broadcast Bloom filter — the huge-key-set form
    of :func:`broadcast_anti_join`.

    The filter (bits only, ~10 bits/key instead of the key bytes) is
    ``ray.put`` once; each batch drops definite non-members
    vectorized. Bloom false positives would WRONGLY drop ~1% of
    qualifying left rows, so with ``exact=True`` (default) the
    survivors-of-the-filter are re-checked against the exact key set —
    the filter then only bounds how many rows reach the exact check.
    ``exact=False`` gives the pure-Bloom approximate variant for when
    the exact set cannot be broadcast at all (documented FP trade)."""
    import ray

    keys = list(right_keys)
    bf = BloomFilter(len(keys) or 1)
    bf.add_many(keys)
    ref = ray.put((bf, set(keys) if exact else None))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_size_warnings()
        f, exact_keys = ray.get(ref)
        maybe = f.might_contain(batch[left_on])
        if exact_keys is None:
            return batch[~maybe]
        out = batch[~maybe]
        candidates = batch[maybe]
        true_members = candidates[left_on].isin(exact_keys)
        return pd.concat([out, candidates[~true_members]]).sort_index()

    return left.map_batches(keep, batch_format="pandas")


def bloom_from_dataset(
    keys_ds: rd.Dataset,
    key_col: str,
    capacity: int | None = None,
    bits_per_key: int = 10,
    k: int = 7,
    fanout: int = 32,
) -> BloomFilter:
    """Build a :class:`BloomFilter` over a key COLUMN of a Dataset —
    fully distributed; no exact key set ever reaches the driver.

    Each block builds a partial bit array in ``map_batches`` (insert
    is idempotent, so no distinct pass is needed); partials OR-merge
    in a two-level tree (OR of bit arrays is associative and
    commutative). Only the final ``m/8``-byte bit array — which must
    be broadcast anyway — crosses to the driver. This mirrors the
    reference's implicit semi-join state build (``core/state.py:
    824-840``) at the scale where the key set itself no longer fits
    one process.

    ``capacity`` sizes the filter (bits = capacity × bits_per_key) and
    must be fixed BEFORE the build so every partial shares ``m``; any
    upper bound works (e.g. the pre-filter row count from parquet
    metadata). Defaults to ``keys_ds.count()``, which executes the
    keys lineage once.
    """
    if capacity is None:
        capacity = keys_ds.count()
    proto = BloomFilter(max(int(capacity), 1), bits_per_key, k)
    m, kk, nwords = proto.m, proto.k, len(proto.bits)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter.__new__(BloomFilter)
        f.m, f.k = m, kk
        f.bits = np.zeros(nwords, dtype=np.uint64)
        if len(batch):
            f.add_many(batch[key_col])
        return pd.DataFrame({"bits": [f.bits.tobytes()]})

    def or_merge(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nwords, dtype=np.uint64)
        for b in batch["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    partials = keys_ds.map_batches(partial, batch_format="pandas")
    merged = (
        partials.repartition(fanout)
        .map_batches(or_merge, batch_size=None, batch_format="pandas")
        .repartition(1)
        .map_batches(or_merge, batch_size=None, batch_format="pandas")
    )
    row = merged.take(1)[0]
    bf = BloomFilter.__new__(BloomFilter)
    bf.m, bf.k = m, kk
    bf.bits = np.frombuffer(row["bits"], dtype=np.uint64).copy()
    return bf


def partitioned_anti_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    left_on: str,
    right_on: str,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Distributed exact anti-join: rows of ``left`` whose key appears
    NOWHERE in ``right_keys[right_on]``.

    Shuffle-based sibling of :func:`broadcast_anti_join` for when the
    key set is too large to broadcast: both sides are co-partitioned
    by key hash in ONE shuffle (side-tagged padded union, the
    :func:`partitioned_hash_join` trick) and each partition drops its
    left rows vectorized with ``isin`` against the partition-local
    keys. Nothing reaches the driver."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    l_cols = list(left.schema().names)
    l_dtypes = _schema_dtypes(left)

    def pad_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__side"] = "l"
        return df[l_cols + ["__side"]]

    def pad_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({left_on: df[right_on].drop_duplicates()})
        out["__side"] = "r"
        for c in l_cols:
            if c != left_on:
                out[c] = None
        return out[l_cols + ["__side"]]

    both = left.map_batches(pad_left, batch_format="pandas").union(
        right_keys.map_batches(pad_right, batch_format="pandas")
    )

    def anti_part(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"]
        keys = g.loc[g["__side"] == "r", left_on]
        out = lg[~lg[left_on].isin(set(keys))][l_cols].copy()
        return _restore_dtypes(out, l_dtypes)

    return partitioned_apply(both, [left_on], anti_part, num_parts)


def bloom_anti_join_dataset(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    left_on: str,
    right_on: str,
    capacity: int | None = None,
    exact: bool = True,
    bits_per_key: int = 10,
    k: int = 7,
) -> rd.Dataset:
    """Anti-join where the key side is a DATASET and the driver never
    holds a key set — the true huge-key-set form.

    The Bloom filter is built distributed (:func:`bloom_from_dataset`)
    and broadcast once. Definite non-members (the overwhelming bulk of
    an anti-join's output) stream straight from the filter stage with
    NO shuffle; only the bloom candidates — true matches plus ~1%
    false positives — are co-partitioned against the key dataset for
    the exact residual check (:func:`partitioned_anti_join`), so the
    result is exact while the shuffle moves ~1% of ``left``.

    Trade-off, documented: the two output branches each re-execute the
    ``left`` lineage (two scans). At scale that beats the alternative
    — one scan but a full all-to-all shuffle of ``left`` — because the
    scan is embarrassingly parallel while the shuffle is the
    bottleneck; callers for whom scans dominate should materialize or
    checkpoint ``left`` first. ``exact=False`` skips the residual
    check entirely (single scan, no shuffle, ~1% of qualifying rows
    wrongly dropped — the documented FP trade)."""
    bf = bloom_from_dataset(right_keys, right_on, capacity, bits_per_key, k)
    ref = ray.put(bf)

    def split(want_member: bool):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            maybe = ray.get(ref).might_contain(batch[left_on])
            return batch[maybe] if want_member else batch[~maybe]

        return fn

    direct = left.map_batches(split(False), batch_format="pandas")
    if not exact:
        return direct
    candidates = left.map_batches(split(True), batch_format="pandas")
    survivors = partitioned_anti_join(candidates, right_keys, left_on, right_on)
    return direct.union(survivors)


def tumbling_window_agg(
    events: rd.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
) -> rd.Dataset:
    """Tumbling event-time windows per key: count + exact cents sum.

    Windows are pure projections of the timestamp (floor(epoch/size)),
    so this is a grouped aggregate, pre-combined per batch — the
    streaming-window semantics of SURVEY §2.9 expressed batch-first.
    """

    def project(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(batch.column(ts_col), pa.int64()), 1_000_000)
        win = pc.multiply(
            pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()), float(window_s))), pa.int64()),
            window_s,
        )
        # epoch seconds, not a timestamp: sidesteps ns/us precision and
        # timezone drift between engines when results are compared
        return pa.table(
            {
                key_col: batch.column(key_col),
                "window_start_s": win,
                "value_cents": cents(batch.column(value_col)),
            }
        )

    projected = events.map_batches(project, batch_format="pyarrow")
    return grouped_sums(
        projected, [key_col, "window_start_s"], ["value_cents"], count_alias="n_events"
    )


def time_range_prior_count(
    ds: rd.Dataset,
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_us: int = 600_000_000,
    out_col: str = "n_prior",
) -> rd.Dataset:
    """Big-big NON-EQUI range self-join: for every row, the count of
    rows (across ALL keys) with ``ts`` in ``[row.ts - window, row.ts)``
    — the SQL inequality join ``f.ts >= e.ts - w AND f.ts < e.ts``
    that a naive distributed plan turns into an O(n²) cross join.

    Scale shape — bucket-replicate: time is cut into buckets of the
    window width; each row probes its own bucket and is replicated as
    build input to buckets ``b`` and ``b+1`` (its value can only
    affect probes there), so ONE hash shuffle on the bucket key
    co-locates every (probe, build) pair exactly once. Inside a
    partition the count is a single vectorized ``np.searchsorted``
    over a composite ``(target_bucket, offset)`` int64 key — bucket
    ranges are provably disjoint (range of target ``t`` is
    ``[2tW, (2t+2)W)``), so probes never see another bucket's builds
    and there is no per-bucket Python loop. Cost: 2× build
    replication, one shuffle of (id, ts) residues, O(n log n) per
    partition. Ties: a build with ``ts`` equal to the probe's (the
    probe itself included) is OUTSIDE the half-open window, matching
    the SQL predicate bit for bit.
    """
    W = int(window_us)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch[ts_col].to_numpy(dtype="datetime64[us]").view(np.int64)
        ids = batch[id_col].to_numpy()
        b = ts // W
        probe = pd.DataFrame(
            {id_col: ids, "__ts": ts, "__tgt": b, "__probe": True}
        )
        build = pd.DataFrame(
            {
                id_col: np.full(2 * len(ts), -1, dtype=ids.dtype),
                "__ts": np.concatenate([ts, ts]),
                "__tgt": np.concatenate([b, b + 1]),
                "__probe": np.zeros(2 * len(ts), dtype=bool),
            }
        )
        return pd.concat([probe, build], ignore_index=True)

    exploded = ds.select_columns([id_col, ts_col]).map_batches(
        explode, batch_format="pandas"
    )

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                out_col: pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        probes = g[g["__probe"]]
        builds = g[~g["__probe"]]
        if probes.empty:
            return empty
        bt = builds["__ts"].to_numpy()
        btgt = builds["__tgt"].to_numpy()
        keys = np.sort((btgt + 1) * W + bt)
        pts = probes["__ts"].to_numpy()
        ptgt = probes["__tgt"].to_numpy()
        lo = ptgt * W + pts
        n = np.searchsorted(keys, lo + W, side="left") - np.searchsorted(
            keys, lo, side="left"
        )
        return pd.DataFrame(
            {
                id_col: probes[id_col].to_numpy(),
                out_col: n.astype(np.int64),
            }
        )

    return partitioned_apply(exploded, ["__tgt"], count_part)


# ------------------------------------------------------- analytic windows
#
# SQL analytic functions (row_number / lag / running sum OVER a
# partition) re-expressed Ray-Data-first: ONE hash shuffle co-locates
# each key's rows (partitioned_apply), then the whole partition is
# computed with vectorized pandas groupby kernels — never a per-key
# map_groups dispatch. Ordering inside a key must be made total by
# the caller (pass a unique tie-break column) or results are
# nondeterministic under re-partitioning — same contract as SQL.


def grouped_row_number(
    ds: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    ascending: Sequence[bool],
    out_col: str = "rn",
    num_parts: int | None = None,
) -> rd.Dataset:
    """row_number() OVER (PARTITION BY keys ORDER BY order_by)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    key_list, order_list, asc = list(keys), list(order_by), list(ascending)

    def number(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_list + order_list,
                          ascending=[True] * len(key_list) + asc)
        g[out_col] = g.groupby(key_list, sort=False).cumcount() + 1
        g[out_col] = g[out_col].astype("int64")
        return g

    return partitioned_apply(ds, key_list, number, num_parts=num_parts)


def grouped_lag(
    ds: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    offset: int = 1,
    out_col: str = "lag_value",
    num_parts: int | None = None,
) -> rd.Dataset:
    """lag(value, offset) OVER (PARTITION BY keys ORDER BY order_by);
    the first ``offset`` rows of each key get NaN/NaT (SQL NULL)."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    key_list, order_list = list(keys), list(order_by)

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_list + order_list)
        g[out_col] = g.groupby(key_list, sort=False)[value_col].shift(offset)
        return g

    return partitioned_apply(ds, key_list, lag, num_parts=num_parts)


def grouped_running_sum(
    ds: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "running",
    num_parts: int | None = None,
) -> rd.Dataset:
    """sum(value) OVER (PARTITION BY keys ORDER BY order_by ROWS
    UNBOUNDED PRECEDING). Use an INTEGER value column (e.g. cents):
    integer prefix sums are associativity-free, so the result is
    independent of partitioning and bit-comparable with SQL."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    key_list, order_list = list(keys), list(order_by)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_list + order_list)
        g[out_col] = g.groupby(key_list, sort=False)[value_col].cumsum()
        return g

    return partitioned_apply(ds, key_list, run, num_parts=num_parts)


def grouped_rolling_sum(
    ds: rd.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    window_rows: int,
    out_col: str = "rolling",
    num_parts: int | None = None,
) -> rd.Dataset:
    """sum(value) OVER (PARTITION BY keys ORDER BY order_by ROWS
    ``window_rows - 1`` PRECEDING) — a row-based moving sum.

    Computed as the difference of prefix sums (``cumsum`` minus the
    group-shifted ``cumsum``) — two vectorized cython kernels per
    partition, no per-row windowing and no per-key dispatch. Use an
    INTEGER value column: the trick is only exact when addition is
    associative."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    key_list, order_list = list(keys), list(order_by)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_list + order_list)
        run = g.groupby(key_list, sort=False)[value_col].cumsum()
        prev = run.groupby([g[k] for k in key_list], sort=False).shift(
            window_rows
        ).fillna(0)
        g[out_col] = (run - prev).astype("int64")
        return g

    return partitioned_apply(ds, key_list, roll, num_parts=num_parts)


def global_sorted_rank(
    ds: rd.Dataset, key_col: str, seed: str = "shuffle"
) -> rd.Dataset:
    """Deterministic global shuffle rank: every row gets its 0-based
    position in md5-of-key order — the training-order randomization
    pass (a corpus written sorted by this rank is "shuffled", and the
    shuffle is a pure function of the keys: identical at any
    parallelism, resumable, and stable across re-runs).

    The zipWithIndex shape Ray Data lacks, built scale-safe: the md5
    hex prefix range-partitions rows (uniform by construction, 256
    ordered buckets), a first pass collects ONLY the 256 per-bucket
    counts (residues, not rows), their prefix sums broadcast in the
    task closure, and the ranking pass sorts each bucket locally and
    adds its offset. One shuffle of the rows, one residue pass —
    nothing global ever sorts."""
    return global_ordered_prefix_sum(
        ds, key_col, val_col=None, seed=seed, out_col="rank"
    )


def global_ordered_prefix_sum(
    ds: rd.Dataset,
    key_col: str,
    val_col: str | None = None,
    seed: str = "shuffle",
    out_col: str = "start",
    persist: str = "auto",
) -> rd.Dataset:
    """Running int64 sum of ``val_col`` BEFORE each row, rows taken in
    md5-of-key order — the scan primitive behind deterministic
    shuffling (``val_col=None`` → prefix COUNT, i.e. the 0-based
    rank) and sequence packing (``val_col`` = token count → each
    doc's global token offset).

    Same plan as :func:`global_sorted_rank`: 256 md5-hex-prefix range
    buckets, one residue pass for per-bucket sums, broadcast offsets,
    local sort + cumsum per bucket. One row shuffle, no global sort."""
    import hashlib

    import pandas as pd

    def add_rk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__rk"] = [
            hashlib.md5(f"{seed}:{v}".encode("utf-8")).hexdigest()
            for v in batch[key_col]
        ]
        batch["__bucket"] = [int(h[:2], 16) for h in batch["__rk"]]
        return batch

    # TWO consumers read `keyed` (the residue pass and the scan), so
    # pin it — otherwise the whole upstream lineage (possibly an
    # extraction/analysis pipeline) re-executes per consumer. The pin
    # is ROW-scale (input + md5 hex + bucket int per row), so at
    # corpus scale it belongs on disk, not in the object store: the
    # default routes through a parquet spill; persist="memory" opts
    # back into materialize() for small inputs.
    from vlm_ocr_doc_reader_ray.state.pin import pin

    keyed = pin(
        ds.map_batches(add_rk, batch_format="pandas"),
        persist=persist,
        default="disk",
        label="rank_keyed",
    )

    if val_col is None:
        counts = grouped_sums(keyed, ["__bucket"], [], count_alias="__c")
    else:
        counts = grouped_sums(keyed, ["__bucket"], [val_col])
    counts = counts.to_pandas()
    if counts.empty:  # empty input: emit the schema + out_col, 0 rows
        def empty_scan(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=["__rk", "__bucket"])
            df[out_col] = pd.Series([], dtype="int64")
            return df

        return keyed.map_batches(empty_scan, batch_format="pandas")
    counts = counts.sort_values("__bucket", ignore_index=True)
    sums = counts["__c" if val_col is None else val_col]
    offsets = sums.cumsum().shift(fill_value=0)
    offset_map = dict(zip(counts["__bucket"], offsets.astype("int64")))

    def scan_part(part: pd.DataFrame) -> pd.DataFrame:
        # a hash partition may hold several whole buckets; scan each
        # with one vectorized pass (sort + cumsum), offset from the
        # broadcast residue table. partitioned_apply (task-based, one
        # shuffle) instead of groupby().map_groups: Ray's sort-based
        # groupby re-executes the upstream lineage for boundary
        # sampling, which would recompute every row's md5.
        part = part.sort_values(["__bucket", "__rk", key_col], ignore_index=True)
        if val_col is None:
            v = np.ones(len(part), dtype=np.int64)
        else:
            v = part[val_col].to_numpy(dtype="int64")
        within = (
            pd.Series(v).groupby(part["__bucket"].to_numpy()).cumsum().to_numpy()
            - v
        )
        offs = part["__bucket"].map(offset_map).to_numpy(dtype="int64")
        part[out_col] = offs + within
        return part.drop(columns=["__rk", "__bucket"])

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    return partitioned_apply(keyed, ["__bucket"], scan_part)


def corpus_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Incremental-corpus diff: one row per key with status
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` plus both
    content hashes — the delta a versioned 100-TB corpus pipeline
    reprocesses instead of the whole corpus.

    Both sides collapse to ``(id, sha256(text))`` residues in-map (the
    texts themselves never shuffle), union with a side tag, and ONE
    hash partition by id classifies every key with a vectorized pivot
    (a key's two sides always co-locate). Assumes ``id_col`` is unique
    per side (corpus primary key)."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.dedup import with_text_hash

    def residue(side: str):
        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[[id_col, "text_hash"]].copy()
            out["__side"] = side
            return out

        return tag

    o = with_text_hash(old.select_columns([id_col, text_col]), text_col).map_batches(
        residue("old"), batch_format="pandas"
    )
    n = with_text_hash(new.select_columns([id_col, text_col]), text_col).map_batches(
        residue("new"), batch_format="pandas"
    )

    def classify(part: pd.DataFrame) -> pd.DataFrame:
        w = part.pivot_table(
            index=id_col, columns="__side", values="text_hash",
            aggfunc="first",
        )
        for c in ("old", "new"):
            if c not in w.columns:
                w[c] = None
        w = w.reset_index()
        has_o, has_n = w["old"].notna(), w["new"].notna()
        status = pd.Series("unchanged", index=w.index, dtype="object")
        status[has_n & ~has_o] = "added"
        status[has_o & ~has_n] = "removed"
        status[has_o & has_n & (w["old"] != w["new"])] = "changed"
        return pd.DataFrame(
            {id_col: w[id_col], "status": status,
             # None (not NaN) for the absent side: SQL-null parity
             "old_hash": w["old"].astype(object).where(has_o, None),
             "new_hash": w["new"].astype(object).where(has_n, None)}
        )

    return partitioned_apply(o.union(n), [id_col], classify)


def funnel_counts(
    ds: rd.Dataset,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Ordered-funnel analysis: how many users completed step 1, then
    step 2 STRICTLY AFTER their first step 1, then step 3 strictly
    after that, … (the earliest-qualifying-event rule — each user's
    step-k time is the min event time of ``steps[k]`` after their
    step-(k-1) time).

    Scale shape: events are hash-partitioned by user ONCE (the only
    shuffle — all of a user's rows co-locate), each partition resolves
    every step with vectorized pandas merges (no per-user dispatch),
    and partitions emit one (step, users) residue row each; the global
    answer is a tiny pre-aggregated sum. Timestamp comparisons are
    integer-exact → hash-gate safe. Output: one row per step with the
    count of users reaching it."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )

    step_list = list(steps)

    def part(g: pd.DataFrame) -> pd.DataFrame:
        reached = []
        prev = None  # per-user time of the previous step
        for s in step_list:
            ev = g[g[type_col] == s][[user_col, ts_col]]
            if prev is not None:
                ev = ev.merge(prev, on=user_col)
                ev = ev[ev[ts_col] > ev["__prev"]]
            t = ev.groupby(user_col, as_index=False)[ts_col].min()
            reached.append(len(t))
            prev = t.rename(columns={ts_col: "__prev"})
        return pd.DataFrame(
            {
                "step": pd.array(range(1, len(step_list) + 1), dtype="int64"),
                "event_type": step_list,
                "users": pd.array(reached, dtype="int64"),
            }
        )

    pruned = ds.select_columns([user_col, ts_col, type_col])
    residues = partitioned_apply(pruned, [user_col], part)
    return grouped_sums(residues, ["step", "event_type"], ["users"])


def cohort_retention(
    ds: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 7 * 24 * 3600,
) -> rd.Dataset:
    """Cohort retention: bucket time (default weekly), cohort = each
    user's FIRST bucket, and for every (cohort, offset) count the
    distinct users active ``offset`` buckets after their cohort.

    Scale shape: ONE user-hash shuffle of per-batch-deduped
    (user, bucket) residues co-locates each user's history; inside a
    partition the dedupe completes, the cohort is a vectorized
    groupby-transform min, and the partition collapses straight to
    (cohort, offset, count) residue rows — a user appears at most once
    per (cohort, offset) by construction, so the partial counts sum to
    exact distinct-user counts. (An earlier draft chained
    distinct → groupby-min → hash-join → count: four all-to-alls and
    3.7× slower at driver scale; this is the measured replacement.)
    Bucket arithmetic is integer (floor(epoch/size)) → hash-gate
    exact. Output: (cohort_bucket, offset, users)."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )

    def to_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        secs = pc.cast(
            pc.floor(pc.divide(
                pc.cast(batch.column(ts_col), pa.timestamp("us")).cast(pa.int64()),
                1_000_000,
            )),
            pa.int64(),
        )
        bucket = pc.floor(pc.divide(pc.cast(secs, pa.float64()), bucket_seconds))
        t = pa.table(
            {user_col: batch.column(user_col),
             "bucket": pc.cast(bucket, pa.int64())}
        )
        # per-batch combiner: shuffle distinct residues, not events
        return t.group_by([user_col, "bucket"]).aggregate([])

    pairs = ds.select_columns([user_col, ts_col]).map_batches(
        to_bucket, batch_format="pyarrow"
    )

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([user_col, "bucket"])
        first = g.groupby(user_col)["bucket"].transform("min")
        out = pd.DataFrame(
            {"cohort_bucket": first.astype("int64"),
             "offset": (g["bucket"] - first).astype("int64")}
        )
        res = out.groupby(["cohort_bucket", "offset"], as_index=False).size()
        return res.rename(columns={"size": "users"}).astype({"users": "int64"})

    residues = partitioned_apply(pairs, [user_col], part)
    return grouped_sums(residues, ["cohort_bucket", "offset"], ["users"])


def event_transition_counts(
    ds: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Markov transition counts between consecutive events per user
    (sequence-modeling prep): order each user's stream by the total
    key ``(ts, id)`` — the tie-break makes the result partitioning-
    and engine-independent — take adjacent (src → dst) pairs, count
    globally.

    One user-hash shuffle co-locates each user's events; inside a
    partition the pairing is a single vectorized sort + shift (no
    per-user dispatch — the shift is masked where the user changes),
    and only (src, dst, count) residues aggregate globally."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_sums,
        partitioned_apply,
    )

    def part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col], ignore_index=True)
        src = g[type_col]
        dst = g[type_col].shift(-1)
        same = g[user_col].eq(g[user_col].shift(-1))
        pairs = pd.DataFrame({"src": src[same], "dst": dst[same]})
        out = pairs.groupby(["src", "dst"], as_index=False).size()
        return out.rename(columns={"size": "transitions"}).astype(
            {"transitions": "int64"}
        )

    pruned = ds.select_columns([user_col, ts_col, type_col, id_col])
    residues = partitioned_apply(pruned, [user_col], part)
    return grouped_sums(residues, ["src", "dst"], ["transitions"])


def windowed_distinct_users(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_s: int = 3600,
) -> rd.Dataset:
    """Exact distinct users per tumbling event-time window — the
    streaming COUNT(DISTINCT) : (window, user) pairs dedupe as
    residues (per-batch drop_duplicates, then one hash-partitioned
    distinct), and the count is a pre-aggregated sum of 1s per window;
    the event rows themselves never shuffle. Window arithmetic is the
    engine's integer floor(epoch/size) convention."""
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        distinct_values,
        value_counts,
    )

    def project(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(batch.column(ts_col), pa.int64()), 1_000_000)
        win = pc.multiply(
            pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()), float(window_s))), pa.int64()),
            window_s,
        )
        return pa.table(
            {"window_start_s": win, user_col: batch.column(user_col)}
        )

    projected = events.select_columns([ts_col, user_col]).map_batches(
        project, batch_format="pyarrow"
    )
    pairs = distinct_values(projected, ["window_start_s", user_col])
    return value_counts(pairs, ["window_start_s"], alias="users")


def latest_by_key(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Keep each key's newest row (max ``ts_col``). CONTRACT: ``ts``
    is unique per key (a snapshot clock) — on ties the winner is
    arbitrary (unstable sort + batch boundaries), so callers needing
    determinism under ties must disambiguate the timestamp first
    (e.g. ts*K + snap).

    The recrawl-collapse primitive: a crawl that refetches URLs across
    snapshots collapses to the latest capture per URL. Reference
    analog: none — the reference reads each document once
    (``core/reader.py``); at CC scale the same URL appears in many
    snapshots and latest-wins is the standard collapse.

    Scale shape: a distributed argmax. Each batch first reduces to ONE
    candidate row per key (vectorized sort + drop_duplicates — no
    per-key dispatch), so only per-(batch, key) winners enter the
    single hash shuffle; the final per-partition pass applies the same
    vectorized rule. Full rows ride along with their key (the winner's
    payload must survive), but the shuffle volume is bounded by
    distinct keys x payload, never total rows x payload.
    """
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def local_best(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.sort_values(
            [key_col, ts_col], ascending=[True, False]
        ).drop_duplicates(key_col, keep="first")

    candidates = ds.map_batches(local_best, batch_format="pandas")
    return partitioned_apply(
        candidates, [key_col], local_best, num_parts=num_partitions
    )
