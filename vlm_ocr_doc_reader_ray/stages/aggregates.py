"""Pre-aggregated (combiner-style) grouped aggregates.

A bare ``ds.groupby(key).count()`` shuffles EVERY row to reducers —
measured 2.3× slower than the whole extraction pipeline on 2.5M
registry rows. These helpers collapse each Arrow batch to at most one
row per key first (vectorized ``pyarrow.Table.group_by``), so the
shuffle moves ~(distinct keys × blocks) rows instead of the dataset.
This is the default way to aggregate in this engine; reach for a raw
``groupby`` only when per-group iteration is genuinely needed
(``map_groups`` e.g. for the vote).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

# One hash partition must fit a single worker's pandas heap: a fixed
# partition count would make partition size grow linearly with the
# input (dataset/32 — fine at sf0.1, a scale-killer at 100×), so the
# default derives the count from the dataset's estimated bytes.
MIN_PARTS = 32
TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def auto_num_parts(
    ds: rd.Dataset,
    floor: int = MIN_PARTS,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """``max(floor, ceil(estimated_bytes / target_bytes))``.

    Size is read from plan METADATA ONLY (``infer_metadata``) — never
    ``ds.size_bytes()``, which executes the plan when metadata is
    missing and would re-run an expensive upstream lineage just to
    pick a partition count. Unknown size falls back to ``floor``
    (same behavior as the old fixed default; callers that know their
    scale pass ``num_parts`` explicitly)."""
    size = None
    try:
        size = ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        size = None
    if not size or size <= 0:
        return floor
    return max(floor, -(-size // target_bytes))


_SIZE_WARN_SILENCED = False


def silence_empty_block_size_warnings() -> None:
    """Drop Ray's per-block 'Error calculating size for column …:
    cannot call `vectorize` on size 0 inputs' warning — WORKER-side.

    Ray sizes every pandas block it receives; on an EMPTY block with
    object-dtype columns its ``np.vectorize`` sampler raises and logs
    a warning per column per block. Hash-partitioned appliers
    legitimately emit empty partitions (a key range with no rows), so
    this fires thousands of times at scale — pure noise (the size of
    an empty block is zero; nothing is mis-estimated). The filter is
    installed lazily from inside worker batch fns because workers
    don't run the driver's logging setup; idempotent per process.
    Genuine size-calculation failures on NON-empty data still log.
    """
    global _SIZE_WARN_SILENCED
    if _SIZE_WARN_SILENCED:
        return
    import logging

    class _DropEmptySizeWarning(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "Error calculating size for column" in msg
                and "size 0 inputs" in msg
            )

    logging.getLogger("ray.data._internal.pandas_block").addFilter(
        _DropEmptySizeWarning()
    )
    _SIZE_WARN_SILENCED = True


def partitioned_apply(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    fn,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Hash-partition by ``key_cols`` and run ``fn`` ONCE per partition.

    ``groupby(keys).map_groups(fn)`` pays a Python round-trip per
    distinct key — measured 37s for 270k keys where the work itself is
    ~2s. This helper shuffles by ``hash(keys) % num_parts`` instead
    (``num_parts`` Ray groups total); equal keys are co-located, so
    any group-local computation can run VECTORIZED inside ``fn`` over
    the whole partition (``fn`` gets the partition DataFrame with the
    ``__part`` column already dropped). This is the preferred shape:
    sessionization, keep-last dedup, per-key top-k are all one
    vectorized pandas expression per partition.

    ``num_parts=None`` (default) derives the partition count from the
    dataset's estimated size via :func:`auto_num_parts` so a partition
    stays bounded by ``TARGET_PARTITION_BYTES`` at any input scale.
    """
    import pandas as pd

    if num_parts is None:
        num_parts = auto_num_parts(ds)
    key_list = list(key_cols)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # stable-enough partitioner: results don't depend on placement,
        # only co-location of equal keys matters. Vectorized string
        # concat (no per-row Python).
        key = df[key_list[0]].astype(str)
        for c in key_list[1:]:
            key = key + "|" + df[c].astype(str)
        h = pd.util.hash_pandas_object(key, index=False)
        df["__part"] = (h % num_parts).astype("int64")
        return df

    parted = ds.map_batches(add_part, batch_format="pandas")

    def apply_part(g: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_size_warnings()
        return fn(g.drop(columns="__part"))

    return parted.groupby("__part").map_groups(apply_part, batch_format="pandas")


def partitioned_group_apply(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    fn,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Per-group apply without Ray's per-group dispatch overhead.

    Built on :func:`partitioned_apply`; inside each hash partition a
    pandas ``groupby(keys)`` loop calls ``fn`` per distinct key. Use
    this only when the per-group work is genuinely irreducible (e.g. a
    matrix op per group); prefer :func:`partitioned_apply` with a
    vectorized partition-level ``fn`` everywhere else.
    """
    import pandas as pd

    key_list = list(key_cols)

    def apply_groups(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _key, grp in g.groupby(key_list, sort=False):
            out.append(fn(grp))
        if not out:
            return fn(g.head(0))
        return pd.concat(out, ignore_index=True)

    return partitioned_apply(ds, key_cols, apply_groups, num_parts=num_parts)


def distinct_values(
    ds: rd.Dataset, cols: str | Sequence[str], num_parts: int | None = None
) -> rd.Dataset:
    """Globally-distinct rows of ``cols`` — per-batch combiner, then
    one hash-partitioned vectorized ``drop_duplicates`` per partition.
    The residue a driver collects after this is the TRUE distinct set,
    not distinct-per-batch (which can be up to distinct × blocks
    rows)."""
    col_list = [cols] if isinstance(cols, str) else list(cols)

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[col_list].drop_duplicates()

    combined = ds.map_batches(local, batch_format="pandas")
    return partitioned_apply(combined, col_list, local, num_parts)


def value_counts(
    ds: rd.Dataset,
    keys: str | Sequence[str],
    alias: str = "n",
    checkpoint: bool = False,
    persist: str = "auto",
) -> rd.Dataset:
    """Distinct-value counts of ``keys`` (pre-aggregated groupby).

    ``checkpoint=True`` pins the per-batch residues BEFORE the
    shuffle. Ray's sort-based groupby re-executes its upstream lineage
    for boundary sampling, so when ``ds`` is an expensive lineage (a
    tag scan, a model stage) the default re-runs it ~2×; pinning the
    residues — bounded by batch-distinct keys, never the raw rows —
    makes the shuffle read the pinned copy instead (measured on
    the link-graph stages: the whole query 40.8s → lineage-once).
    The pin routes through :func:`state.pin.pin` (``persist`` knob:
    object store by default here since the residues are key-bounded;
    ``$GRAFT_PIN_PERSIST=disk`` flips every checkpoint to a parquet
    spill cluster-wide).
    """
    from vlm_ocr_doc_reader_ray.state.pin import pin

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(key_list)
        out = t.group_by(key_list).aggregate([([], "count_all")])
        return out.rename_columns(key_list + [alias])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if checkpoint:
        partials = pin(
            partials, persist=persist, default="memory", label="value_counts"
        )
    return partials.groupby(key_list[0] if len(key_list) == 1 else key_list).aggregate(
        Sum(alias, alias_name=alias)
    )


def grouped_sums(
    ds: rd.Dataset,
    keys: str | Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str | None = None,
    checkpoint: bool = False,
    persist: str = "auto",
) -> rd.Dataset:
    """Per-key sums (and optional row count) with per-batch combining.

    ``checkpoint=True`` pins the per-batch residues before the shuffle
    so an expensive upstream lineage executes once (see
    :func:`value_counts` for the measured rationale and the
    ``persist`` knob semantics).
    """
    from vlm_ocr_doc_reader_ray.state.pin import pin

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(key_list + list(sum_cols))
        aggs = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append(([], "count_all"))
        out = t.group_by(key_list).aggregate(aggs)
        names = key_list + list(sum_cols) + ([count_alias] if count_alias else [])
        return out.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if checkpoint:
        partials = pin(
            partials, persist=persist, default="memory", label="grouped_sums"
        )
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(key_list[0] if len(key_list) == 1 else key_list).aggregate(*aggs)


def grouping_sets_sums(
    ds: rd.Dataset,
    keys: Sequence[str],
    sets: Sequence[Sequence[str]],
    sum_cols: Sequence[str],
    count_alias: str | None = None,
    sentinel: str = "ALL",
) -> rd.Dataset:
    """``GROUP BY GROUPING SETS`` re-expressed Ray-Data-first — the
    shared engine under :func:`rollup_sums` and :func:`cube_sums`.

    The raw data is scanned EXACTLY ONCE: the finest level (all
    ``keys``) is one pre-combined :func:`grouped_sums`; every
    requested set re-aggregates the already-collapsed finest residues
    — at 100 TB the whole lattice costs one shuffle of per-batch
    residues plus re-aggregations over ``O(distinct keys)`` rows,
    never extra passes over the corpus. Subtotal rows mark dropped
    STRING key columns with ``sentinel`` (the SQL mirror is
    ``coalesce(key, sentinel)``); key columns must be non-null strings
    for the sentinel to be unambiguous. Each set must preserve the
    order of ``keys``.
    """
    key_list = list(keys)
    cols = list(sum_cols) + ([count_alias] if count_alias else [])
    finest = grouped_sums(ds, key_list, sum_cols, count_alias)

    def canon(level_keys: Sequence[str]):
        kept = list(level_keys)

        def _c(batch: pa.Table) -> pa.Table:
            n = len(batch)
            arrays, names = [], []
            for k in key_list:
                names.append(k)
                if k in kept:
                    arrays.append(batch.column(k))
                else:
                    arrays.append(pa.array([sentinel] * n, type=pa.string()))
            for c in cols:
                names.append(c)
                arrays.append(pc.cast(batch.column(c), pa.int64()))
            return pa.table(dict(zip(names, arrays)))

        return _c

    pieces = []
    for s in sets:
        sub = list(s)
        if sub == key_list:
            lv = finest
        elif sub:
            lv = grouped_sums(finest, sub, cols)
        else:
            def add_all(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "__all", pa.array([0] * len(batch), type=pa.int64())
                )

            lv = grouped_sums(
                finest.map_batches(add_all, batch_format="pyarrow"), ["__all"], cols
            ).drop_columns(["__all"])
        pieces.append(lv.map_batches(canon(sub), batch_format="pyarrow"))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def rollup_sums(
    ds: rd.Dataset,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str | None = None,
    sentinel: str = "ALL",
) -> rd.Dataset:
    """``GROUP BY ROLLUP(keys)``: the prefix lattice
    (k1..kn), (k1..kn-1), …, () over one corpus scan."""
    key_list = list(keys)
    sets = [key_list[:i] for i in range(len(key_list), -1, -1)]
    return grouping_sets_sums(ds, key_list, sets, sum_cols, count_alias, sentinel)


def cube_sums(
    ds: rd.Dataset,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str | None = None,
    sentinel: str = "ALL",
) -> rd.Dataset:
    """``GROUP BY CUBE(keys)``: every key subset (order-preserving)
    over one corpus scan — 2^k re-aggregations of the finest
    residues, zero extra passes over the raw data."""
    key_list = list(keys)
    sets: list[list[str]] = [[]]
    for k in key_list:
        sets = sets + [s + [k] for s in sets]
    sets.sort(key=lambda s: -len(s))
    return grouping_sets_sums(ds, key_list, sets, sum_cols, count_alias, sentinel)


def pivot_counts(
    ds: rd.Dataset,
    index_col: str,
    pivot_col: str,
    values: Sequence[str],
    prefix: str = "n_",
) -> rd.Dataset:
    """Pivot row counts into wide columns — ``values`` must be
    DECLARED up front (the Spark ``pivot(values=...)`` contract): a
    schema cannot depend on the data without a blocking discovery
    pass, so undeclared pivot values raise rather than silently
    widening. SQL mirror: one ``count(*) FILTER (WHERE ...)`` per
    declared value.

    Scale shape: the corpus collapses to (index, pivot, count)
    residues via pre-combined :func:`grouped_sums` (one shuffle of
    residues); widening is a vectorized pivot per index-hash
    partition over ``O(distinct index × values)`` rows.
    """
    vals = list(values)
    finest = grouped_sums(ds, [index_col, pivot_col], [], count_alias="__n")

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        cols = [index_col] + [f"{prefix}{v}" for v in vals]
        if g.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype="object" if c == index_col else "int64") for c in cols}
            )
        extra = set(g[pivot_col]) - set(vals)
        if extra:
            raise ValueError(
                f"pivot_counts: undeclared {pivot_col} values {sorted(extra)[:5]}; "
                "declare them in `values` — the output schema never widens silently"
            )
        w = (
            g.pivot_table(index=index_col, columns=pivot_col, values="__n",
                          aggfunc="sum", fill_value=0)
            .reindex(columns=vals, fill_value=0)
            .astype("int64")
        )
        w.columns = [f"{prefix}{v}" for v in vals]
        return w.reset_index()[cols]

    return partitioned_apply(finest, [index_col], widen)


def exact_quantiles(
    ds: rd.Dataset, col: str, qs: Sequence[float]
) -> pd.DataFrame:
    """EXACT discrete quantiles of an integer-like column via a
    distributed counting histogram.

    The corpus never sorts: each batch collapses to (value, count)
    residues, the global histogram is a pre-aggregated sum, and the
    quantile is read off the cumulative histogram. Contract: ``col``
    has bounded distinct cardinality (lengths, counts, scores — the
    usual quantile targets), so the histogram fits the driver by
    construction. Quantile rule matches DuckDB ``quantile_disc``:
    element at 1-based index ``max(ceil(q*n), 1)`` of the sorted
    column (pinned by test). Returns a small pandas DataFrame
    ``(q, value)``."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL quantile functions ignore NULLs — so do we
        vc = pc.value_counts(pc.drop_null(batch.column(col)))
        return pa.table(
            {"v": vc.field("values"),
             "c": pc.cast(vc.field("counts"), pa.int64())}
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    if hist.empty:  # Ray groupby on an empty dataset loses the schema
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="int64")})
    hist = hist.sort_values("v", ignore_index=True)
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum()
    out = []
    for q in qs:
        # 1-based target index, same float expression DuckDB evaluates
        target = max(math.ceil(q * n), 1)
        idx = int((cum >= target).idxmax())
        out.append((q, hist["v"].iloc[idx]))
    return pd.DataFrame({"q": [o[0] for o in out], "value": [o[1] for o in out]})


def approx_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: Sequence[float],
    bins: int = 8192,
) -> pd.DataFrame:
    """Approximate quantiles of an UNBOUNDED-cardinality numeric
    column — the companion to :func:`exact_quantiles`, whose counting
    histogram requires bounded distinct values.

    Two residue-bounded passes: exact global (min, max) via per-batch
    combiners, then an exact count per fixed-width bin (per-batch
    ``np.bincount`` residues, pre-aggregated sum — at most ``bins``
    rows ever reach the driver). The returned value is the lower edge
    of the bin holding the q-th element, so the value error is
    bounded by ONE bin width ``(max-min)/bins`` regardless of data
    size or skew, and the result is fully deterministic (no sampling,
    unlike t-digest/GK sketches). Returns a small (q, value, err)
    pandas DataFrame, ``err`` = the bin width."""
    import math

    import numpy as np

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    mm = ds.aggregate(_Min(col, alias_name="lo"), _Max(col, alias_name="hi"))
    if not mm or mm.get("lo") is None:  # empty input → empty result
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="float64"),
                             "err": pd.Series([], dtype="float64")})
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi <= lo:
        return pd.DataFrame({"q": list(qs), "value": [lo] * len(qs),
                             "err": [0.0] * len(qs)})
    width = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]  # SQL quantiles ignore NULLs — so do we
        idx = np.clip(((v - lo) / (hi - lo) * bins).astype(np.int64), 0, bins - 1)
        c = np.bincount(idx, minlength=bins)
        nz = np.nonzero(c)[0]
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "c": pa.array(c[nz], type=pa.int64())})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("b", ignore_index=True)
    )
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum()
    out = []
    for q in qs:
        target = max(math.ceil(q * n), 1)
        i = int((cum >= target).idxmax())
        out.append((q, lo + hist["b"].iloc[i] * width, width))
    return pd.DataFrame(out, columns=["q", "value", "err"])


def grouped_exact_quantiles(
    ds: rd.Dataset,
    group_cols: str | Sequence[str],
    col: str,
    qs: Sequence[float],
) -> rd.Dataset:
    """EXACT per-group discrete quantiles via per-group counting
    histograms — the grouped twin of :func:`exact_quantiles`.

    Per-batch combiner collapses to ``(group, value, count)``
    residues, the global histogram is a pre-aggregated sum, and each
    hash partition reads its groups' quantiles off cumulative sums
    with ONE vectorized pandas pass (no per-key dispatch). Same
    ``quantile_disc`` index rule (1-based ``max(ceil(q*n), 1)``).
    NULL values are ignored (the SQL aggregate convention); a group
    whose values are ALL null is omitted entirely (SQL would emit a
    NULL-quantile row for it — pinned by test). Contract: distinct
    (group, value) pairs bound the shuffle, not the data. Output: one
    ``(group…, q, value)`` row per group × q."""
    import numpy as np

    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def drop_null_vals(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL quantile aggregates ignore NULL values (not NULL groups)
        return batch.filter(pc.is_valid(batch.column(col)))

    cleaned = ds.select_columns(key_list + [col]).map_batches(
        drop_null_vals, batch_format="pyarrow"
    )
    hist = value_counts(cleaned, key_list + [col], alias="__c")

    def qpart(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_list + [col], ignore_index=True)
        grp = g.groupby(key_list, sort=False)
        cum = grp["__c"].cumsum().to_numpy()
        n = grp["__c"].transform("sum").to_numpy()
        frames = []
        for q in qs:
            target = np.maximum(np.ceil(q * n).astype("int64"), 1)
            hit = g[cum >= target]
            first = hit.groupby(key_list, sort=False, as_index=False).first()
            first["q"] = float(q)
            frames.append(first[key_list + ["q", col]])
        out = pd.concat(frames, ignore_index=True)
        return out.rename(columns={col: "value"})

    return partitioned_apply(hist, key_list, qpart)


def grouped_winsorize(
    ds: rd.Dataset,
    group_cols: str | Sequence[str],
    col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    out_col: str | None = None,
) -> rd.Dataset:
    """Winsorize ``col`` against ITS OWN group's exact quantile band:
    values are clipped into ``[q_lo, q_hi]`` of their group — the
    outlier-robust normalization a quality pipeline applies before
    mixing heterogeneous sources.

    Scale shape (same as :func:`grouped_quantile_gate`): per-group
    thresholds come from residue counting histograms, collapse to one
    tiny ``group → (lo, hi)`` table broadcast ONCE, and the clip is a
    vectorized two-sided ``np.clip`` per batch — the corpus streams
    through with zero row shuffles. Groups absent from the threshold
    table (all-null values) are dropped, matching the SQL inner join.
    Exact for integer-like columns (the clip bounds are actual data
    values, no interpolation).
    """
    import numpy as np

    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    out_name = out_col or f"{col}_winsorized"

    thr = grouped_exact_quantiles(ds, key_list, col, [lo_q, hi_q]).to_pandas()
    table = {}
    for _, r in thr.iterrows():
        k = tuple(r[c] for c in key_list)
        lo, hi = table.get(k, (None, None))
        if r["q"] == float(lo_q):
            lo = r["value"]
        else:
            hi = r["value"]
        table[k] = (lo, hi)
    ref = ray.put(table)

    def clip(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            batch[out_name] = pd.Series([], dtype=batch[col].dtype)
            return batch
        t = ray.get(ref)
        keys = pd.Series(zip(*(batch[k] for k in key_list)), index=batch.index)
        bounds = keys.map(t)
        ok = bounds.notna()
        batch = batch[ok.to_numpy(dtype=bool)].copy()
        if batch.empty:
            batch[out_name] = pd.Series([], dtype=batch[col].dtype)
            return batch
        bounds = bounds[ok]
        lo = np.array([b[0] for b in bounds])
        hi = np.array([b[1] for b in bounds])
        batch[out_name] = np.clip(batch[col].to_numpy(), lo, hi)
        return batch

    return ds.map_batches(clip, batch_format="pandas")


def grouped_min_max(
    ds: rd.Dataset, keys: str | Sequence[str], col: str
) -> rd.Dataset:
    """Per-key min/max with per-batch combining."""
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(key_list + [col])
        out = t.group_by(key_list).aggregate([(col, "min"), (col, "max")])
        return out.rename_columns(key_list + [f"{col}_min", f"{col}_max"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key_list[0] if len(key_list) == 1 else key_list).aggregate(
        Min(f"{col}_min", alias_name=f"{col}_min"),
        Max(f"{col}_max", alias_name=f"{col}_max"),
    )


def grouped_quantile_gate(
    ds: rd.Dataset,
    group_cols: str | Sequence[str],
    col: str,
    q: float = 0.5,
    keep: str = "ge",
) -> rd.Dataset:
    """Filter rows against THEIR OWN group's exact quantile (e.g. keep
    documents at/above their language's median length) — the per-group
    adaptive twin of a fixed-threshold gate.

    Scale shape: the thresholds come from
    :func:`grouped_exact_quantiles` (residue histogram shuffle, never
    the rows), collapse to one tiny ``group → threshold`` table that is
    broadcast ONCE (``ray.put``), and the gate itself is a single
    vectorized comparison per batch — the corpus streams through
    untouched by any row shuffle. Groups absent from the threshold
    table (all-null values) drop their rows, matching the SQL inner
    join. ``keep`` ∈ {"ge", "gt", "le", "lt"}.
    """
    import operator

    import pandas as pd

    ops = {"ge": operator.ge, "gt": operator.gt,
           "le": operator.le, "lt": operator.lt}
    op = ops[keep]
    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    thr = grouped_exact_quantiles(ds, key_list, col, [q]).to_pandas()
    table = {tuple(r[k] for k in key_list): r["value"]
             for _, r in thr.iterrows()}
    ref = ray.put(table)

    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return batch
        t = ray.get(ref)
        keys = pd.Series(zip(*(batch[k] for k in key_list)), index=batch.index)
        lim = keys.map(t)
        mask = lim.notna() & op(batch[col], lim)
        return batch[mask.to_numpy(dtype=bool)]

    return ds.map_batches(gate, batch_format="pandas")


def grouped_percentile_rank(
    ds: rd.Dataset,
    group_cols: str | Sequence[str],
    col: str,
    out_col: str = "pct",
) -> rd.Dataset:
    """Exact within-group percentile rank (SQL ``cume_dist``:
    rows ≤ value / group size) WITHOUT a window-function sort: the
    per-group cumulative histogram is built from ``(group, value,
    count)`` residues (bounding the shuffle by distinct pairs, not
    rows), broadcast once, and each batch reads its rows' ranks off a
    vectorized ``searchsorted``. Arithmetic is integer until the one
    final IEEE division, so ranks equal the window function
    bit-for-bit. Contract: distinct (group, value) pairs fit one
    worker (lengths, scores — the usual rank targets).
    """
    import numpy as np

    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    hist = value_counts(
        ds.select_columns(key_list + [col]), key_list + [col], alias="__c"
    ).to_pandas()
    table: dict = {}
    if hist.empty:
        # an empty input loses the groupby schema entirely (Ray
        # convention) — skip threshold building; rank() only ever sees
        # empty batches and returns them typed.
        hist = pd.DataFrame({c: [] for c in key_list + [col, "__c"]})
    hist = hist.sort_values(key_list + [col], ignore_index=True)
    for key, g in hist.groupby(key_list[0] if len(key_list) == 1 else key_list):
        vals = g[col].to_numpy()
        cum = g["__c"].to_numpy().cumsum()
        table[key] = (vals, cum.astype(np.int64), int(cum[-1]))
    ref = ray.put(table)

    def rank(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            out = batch.copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        t = ray.get(ref)
        out = batch.copy()
        pct = np.empty(len(batch), dtype=np.float64)
        if len(key_list) == 1:
            gkeys = batch[key_list[0]]
        else:
            gkeys = pd.Series(zip(*(batch[k] for k in key_list)), index=batch.index)
        pos = 0
        for key, g in batch.groupby(gkeys, sort=False):
            vals, cum, n = t[key]
            idx = np.searchsorted(vals, g[col].to_numpy(), side="right") - 1
            loc = batch.index.get_indexer(g.index)
            pct[loc] = cum[idx].astype(np.float64) / np.float64(n)
        out[out_col] = pct
        return out

    return ds.map_batches(rank, batch_format="pandas")


def grouped_zscore(
    ds: rd.Dataset,
    group_cols: str | Sequence[str],
    col: str,
    out_col: str = "z",
    ddof: int = 0,
    keep_cols: Sequence[str] | None = None,
) -> rd.Dataset:
    """Per-group standardization (z-score) that is BIT-EXACT at any
    parallelism AND cross-engine: moments come from integer sums
    (``Σx``, ``Σx²`` over an integer-like column — associative, so
    block layout can't perturb them), and mean/variance/σ are then ONE
    fixed float expression (``s/n``, ``(s2 - s·s/n)/(n-ddof)``,
    IEEE sqrt is correctly rounded) — the SQL mirror writes the SAME
    expression from the same integers instead of ``var_pop`` (whose
    streaming accumulator may differ in the last ulp). Groups with
    zero variance (or n ≤ ddof) emit NULL z. Contract: ``col`` is
    integer-valued and ``Σx² < 2^63`` per group.
    """
    import numpy as np

    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def with_sq(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.cast(batch.column(col), pa.int64())
        return pa.table(
            {**{k: batch.column(k) for k in key_list},
             col: v, "__sq": pc.multiply_checked(v, v)}
        )

    proj = ds.select_columns(key_list + [col]).map_batches(
        with_sq, batch_format="pyarrow"
    )
    moments = grouped_sums(proj, key_list, [col, "__sq"], count_alias="__n")
    mpdf = moments.to_pandas()
    table = {}
    for _, r in mpdf.iterrows():
        key = tuple(r[k] for k in key_list)
        n = np.float64(r["__n"])
        s = np.float64(r[col])
        s2 = np.float64(r["__sq"])
        mean = s / n
        denom = n - ddof
        var = (s2 - s * s / n) / denom if denom > 0 else np.nan
        sd = np.sqrt(var) if var > 0 else np.nan
        table[key] = (mean, sd)
    ref = ray.put(table)

    def z(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        if batch.empty:
            out[out_col] = pd.Series([], dtype="float64")
            return out
        t = ray.get(ref)
        if len(key_list) == 1:
            # vectorized dict map on the bare key (the common path)
            means = {k[0]: v[0] for k, v in t.items()}
            sds = {k[0]: v[1] for k, v in t.items()}
            mean = batch[key_list[0]].map(means).astype("float64")
            sd = batch[key_list[0]].map(sds).astype("float64")
        else:
            keys = pd.Series(zip(*(batch[k] for k in key_list)), index=batch.index)
            mean = keys.map(lambda k: t.get(k, (np.nan, np.nan))[0]).astype("float64")
            sd = keys.map(lambda k: t.get(k, (np.nan, np.nan))[1]).astype("float64")
        out[out_col] = (batch[col].astype("float64") - mean) / sd
        return out

    keep = list(keep_cols) if keep_cols else []
    out_cols = keep + [c for c in key_list if c not in keep] + [col]
    return ds.select_columns(out_cols).map_batches(z, batch_format="pandas")
