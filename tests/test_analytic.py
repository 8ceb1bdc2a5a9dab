"""Analytic window operators (row_number / lag / running sum):
pinned against plain-pandas window computations and invariant under
input partitioning, including a skewed key."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vlm_ocr_doc_reader_ray.stages.relational import (
    grouped_lag,
    grouped_row_number,
    grouped_running_sum,
)


def _frame(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 40, n)
    keys[: n // 2] = 7  # one key owns half the rows
    return pd.DataFrame(
        {
            "k": keys.astype("int64"),
            "v": rng.integers(-1000, 1000, n).astype("int64"),
            "uid": np.arange(n, dtype="int64"),
        }
    )


def test_grouped_row_number_matches_pandas(ray_session):
    import ray.data as rd

    df = _frame()
    want = df.sort_values(["k", "v", "uid"], ascending=[True, False, True])
    want = want.assign(rn=(want.groupby("k").cumcount() + 1).astype("int64"))
    for nblocks in (1, 9):
        got = (
            grouped_row_number(
                rd.from_pandas(df).repartition(nblocks),
                ["k"], ["v", "uid"], ascending=[False, True],
            )
            .to_pandas()
            .sort_values("uid", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got[["uid", "rn"]],
            want.sort_values("uid", ignore_index=True)[["uid", "rn"]],
        )


def test_grouped_lag_sentinel_and_order(ray_session):
    import ray.data as rd

    df = _frame(500)
    got = (
        grouped_lag(rd.from_pandas(df).repartition(5), ["k"], ["uid"], "v",
                    out_col="prev_v")
        .to_pandas()
        .sort_values("uid", ignore_index=True)
    )
    want = df.sort_values(["k", "uid"])
    want = want.assign(prev_v=want.groupby("k")["v"].shift(1))
    want = want.sort_values("uid", ignore_index=True)
    assert got.prev_v.isna().sum() == df.k.nunique()  # one NULL per key
    pd.testing.assert_series_equal(got.prev_v, want.prev_v)


def test_grouped_running_sum_is_partition_invariant(ray_session):
    import ray.data as rd

    df = _frame(2000, seed=9)
    outs = []
    for nblocks in (1, 7):
        outs.append(
            grouped_running_sum(
                rd.from_pandas(df).repartition(nblocks),
                ["k"], ["uid"], "v", out_col="run",
            )
            .to_pandas()
            .sort_values("uid", ignore_index=True)[["uid", "run"]]
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    want = df.sort_values(["k", "uid"])
    want = want.assign(run=want.groupby("k")["v"].cumsum())
    pd.testing.assert_series_equal(
        outs[0].set_index("uid")["run"].sort_index(),
        want.set_index("uid")["run"].sort_index(),
    )
