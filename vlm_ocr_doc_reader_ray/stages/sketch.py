"""Cardinality sketching: HyperLogLog distinct counts that merge
across blocks without ever shuffling the data.

The 100-TB use case: "how many distinct pages / hosts / texts" where
an exact ``unique()`` would be an all-to-all shuffle of every row.
HLL collapses each block to ``2^p`` one-byte registers inside
``map_batches`` (a combiner), and registers merge by element-wise
max — associative, so the reduction tree's shape doesn't matter.

Determinism contract: the hash is ``md5_u64`` (first 8 md5 bytes,
big-endian), the same process-stable hash the dedup family pins, so
the register table is bit-reproducible and the DuckDB oracle
recomputes it exactly via ``('0x' || substr(md5(v),1,16))::UBIGINT``
and ``bin()`` bit-length arithmetic. The estimate itself (float
bias correction) is pytest-bounded against exact counts, not
SQL-hashed.

Reference: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0)."""
    out = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        v[big] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


def hll_register_rows(values: pd.Series, p: int) -> pd.DataFrame:
    """One batch's non-empty HLL registers as (bucket, rho) rows."""
    strs = values.astype(str)
    h = np.fromiter(
        (md5_u64(s) for s in strs), dtype=np.uint64, count=len(strs)
    )
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    # rho: leading-zero count within the (64-p)-bit window, + 1
    rho = (64 - p) - _bit_length_u64(rest) + 1
    df = pd.DataFrame({"bucket": bucket, "rho": rho.astype("int64")})
    return df.groupby("bucket", sort=False, as_index=False)["rho"].max()


def hll_registers(ds: rd.Dataset, col: str, p: int = 9) -> rd.Dataset:
    """Dataset → (bucket, rho_max) register table, ≤ 2^p rows.

    Per-batch combiner first (each block collapses to ≤ 2^p rows
    before anything moves), then one tiny hash-partitioned max —
    the input column itself never shuffles."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        return hll_register_rows(df[col], p)

    partial = ds.map_batches(per_batch, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bucket", sort=False, as_index=False)["rho"].max()
        return out.rename(columns={"rho": "rho_max"})

    return partitioned_apply(partial, ["bucket"], merge, num_parts=8)


def hll_estimate(registers: pd.DataFrame, p: int = 9) -> float:
    """Bias-corrected estimate from a (bucket, rho_max) table.

    Small-range correction (linear counting) when the raw estimate is
    below 2.5m, per the HLL paper; absent buckets count as rho 0."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    rho = np.zeros(m, dtype=np.float64)
    rho[registers["bucket"].to_numpy()] = registers["rho_max"].to_numpy()
    raw = alpha * m * m / np.sum(np.power(2.0, -rho))
    zeros = m - len(registers)
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def distinct_count_hll(ds: rd.Dataset, col: str, p: int = 9) -> float:
    """End-to-end approximate COUNT(DISTINCT col)."""
    regs = hll_registers(ds, col, p).to_pandas()
    return hll_estimate(regs, p)


def _cms_slots(keys: pd.Series, j: int, width: int) -> np.ndarray:
    """Row ``j``'s slot for each key — vectorized siphash via
    ``hash_pandas_object`` with a per-row 16-byte key. The CMS
    guarantee (estimate >= true count) holds for ANY hash family, so
    exactness of :func:`heavy_hitters` does not depend on this
    choice — only the candidate-set size does."""
    hk = f"cms{j:012d}!"
    # hash_key only perturbs OBJECT/string dtypes — for integer key
    # columns all depth rows would compute identical slots, silently
    # collapsing the sketch to depth 1. Cast to str so every dtype
    # gets an independent hash per row j.
    if keys.dtype != object:
        keys = keys.astype(str)
    h = pd.util.hash_pandas_object(keys, index=False, hash_key=hk).to_numpy()
    return (h % np.uint64(width)).astype(np.int64)


def cms_build(
    ds: rd.Dataset,
    col: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
) -> np.ndarray:
    """Merged count-min sketch of ``ds[col]`` as a dense
    ``(depth, width)`` int64 matrix on the driver.

    Each batch collapses to its local value counts, scatters them into
    ≤ ``depth × width`` sparse ``(j, slot, n)`` residue rows (a
    combiner — bounded by the SKETCH size, not the data), and the
    global merge is a pre-aggregated sum over those residues. The
    driver receives at most ``depth × width`` rows regardless of
    corpus size — that bounded footprint is the point of a sketch.

    With ``weight_col`` the input is already a (key, count) residue
    table and each key contributes its count instead of 1 — the shape
    :func:`heavy_hitters` feeds after its single collapse pass."""
    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    def partial(batch) -> pd.DataFrame:
        # arrow value_counts first: only the batch's DISTINCT keys are
        # ever materialized as Python-side objects for hashing
        import pyarrow.compute as pc

        if weight_col is None:
            vc = pc.value_counts(batch.column(col))
            keys = vc.field("values").to_pandas()
            n = vc.field("counts").to_numpy().astype("int64")
        else:
            keys = batch.column(col).to_pandas()
            n = batch.column(weight_col).to_numpy().astype("int64")
        rows = []
        for j in range(depth):
            dfj = pd.DataFrame(
                {"j": np.int64(j), "slot": _cms_slots(keys, j, width), "n": n}
            )
            rows.append(dfj.groupby(["j", "slot"], as_index=False)["n"].sum())
        if not rows:
            return pd.DataFrame(
                {"j": pd.Series([], dtype="int64"),
                 "slot": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = grouped_sums(partials, ["j", "slot"], ["n"]).to_pandas()
    dense = np.zeros((depth, width), dtype=np.int64)
    if len(merged):  # empty input → all-zero sketch (schema is lost)
        dense[merged["j"].to_numpy(), merged["slot"].to_numpy()] = merged["n"].to_numpy()
    return dense


def heavy_hitters(
    ds: rd.Dataset,
    col: str,
    threshold: int,
    width: int = 2048,
    depth: int = 4,
    alias: str = "n",
) -> rd.Dataset:
    """EXACT keys with global count >= ``threshold`` via the classic
    two-pass count-min filter.

    Pass 0 — the ONLY pass over the stream — collapses every batch to
    its local ``(key, count)`` value-count residues and materializes
    them, so an expensive upstream lineage (n-gram explode, extraction)
    executes once, not once per CMS pass. Pass 1 builds the merged CMS
    over the weighted residues (bounded driver footprint, see
    :func:`cms_build`) and broadcasts it once with ``ray.put``. Pass 2
    re-reads the residues, keeps only keys whose CMS estimate clears
    the threshold (no false negatives: a CMS estimate is always >= the
    true count, so every true heavy hitter survives), and exact-counts
    just those candidates with a pre-aggregated groupby. The final
    filter removes CMS false positives, so the output is exactly
    ``GROUP BY col HAVING count(*) >= threshold`` — but only residues
    ever shuffle or materialize, never the stream (the residue table is
    distinct-keys-per-block, object-store-resident, free to spill).

    ``threshold`` must be >= 1 (a zero-count sentinel row keeps the
    residue exchange schema-stable when no candidates exist)."""
    import ray

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_sums

    if threshold < 1:
        raise ValueError("threshold must be >= 1")

    def collapse(batch) -> pd.DataFrame:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column(col))
        return pd.DataFrame(
            {col: pd.Series(vc.field("values").to_pandas().to_numpy(),
                            dtype="object"),
             alias: vc.field("counts").to_numpy().astype("int64")}
        )

    local_counts = ds.map_batches(collapse, batch_format="pyarrow").materialize()
    cms_ref = ray.put(
        cms_build(local_counts, col, width, depth, weight_col=alias)
    )

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        cms = ray.get(cms_ref)
        if len(batch) == 0:
            return batch
        est = np.full(len(batch), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(depth):
            est = np.minimum(est, cms[j, _cms_slots(batch[col], j, width)])
        return batch[est >= threshold]

    residues = local_counts.map_batches(candidates, batch_format="pandas")
    # sentinel keeps the groupby schema-stable even with 0 candidates;
    # it adds 0 to one key's sum, so it can never change the output
    sentinel = rd.from_pandas(pd.DataFrame({col: [""], alias: [0]}))
    totals = grouped_sums(residues.union(sentinel), [col], [alias])

    def final(batch):
        # arrow filter: empty outputs keep a sized schema (pandas
        # object-dtype empties trip Ray's block-size estimator)
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column(alias), threshold))

    return totals.map_batches(final, batch_format="pyarrow")


def grouped_hll_registers(
    ds: rd.Dataset,
    group_cols: str | list,
    col: str,
    p: int = 9,
) -> rd.Dataset:
    """Per-group HLL register tables — approximate COUNT(DISTINCT col)
    GROUP BY group_cols without shuffling any row: each batch collapses
    to ≤ groups × 2^p ``(group…, bucket, rho)`` residues, the global
    merge is one pre-aggregated max over residues. Same md5_u64 hash
    contract as :func:`hll_registers`, so the register table is
    bit-reproducible and SQL-recomputable."""
    from ray.data.aggregate import Max

    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        strs = df[col].astype(str)
        h = np.fromiter(
            (md5_u64(s) for s in strs), dtype=np.uint64, count=len(strs)
        )
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
        rho = (64 - p) - _bit_length_u64(rest) + 1
        out = df[key_list].copy()
        out["bucket"] = bucket
        out["rho"] = rho.astype("int64")
        return out.groupby(key_list + ["bucket"], sort=False, as_index=False)[
            "rho"
        ].max()

    partial = ds.select_columns(key_list + [col]).map_batches(
        per_batch, batch_format="pandas"
    )
    return partial.groupby(key_list + ["bucket"]).aggregate(
        Max("rho", alias_name="rho_max")
    )


def grouped_distinct_hll(
    ds: rd.Dataset, group_cols: str | list, col: str, p: int = 9
) -> pd.DataFrame:
    """Per-group approximate distinct counts: the register merge above
    plus the bias-corrected estimate per group (one bounded pandas
    pass on the driver — ≤ groups × 2^p rows)."""
    key_list = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    regs = grouped_hll_registers(ds, key_list, col, p).to_pandas()
    rows = []
    for key, g in regs.groupby(key_list[0] if len(key_list) == 1 else key_list):
        est = hll_estimate(g.rename(columns={"rho_max": "rho_max"}), p)
        row = dict(zip(key_list, key if isinstance(key, tuple) else (key,)))
        row["approx_distinct"] = est
        rows.append(row)
    return pd.DataFrame(rows)
