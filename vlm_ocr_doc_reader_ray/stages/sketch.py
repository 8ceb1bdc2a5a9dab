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
