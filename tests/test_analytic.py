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


def test_grouped_rolling_sum_matches_pandas(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import grouped_rolling_sum

    df = _frame(1500, seed=13)
    got = (
        grouped_rolling_sum(
            rd.from_pandas(df).repartition(6), ["k"], ["uid"], "v",
            window_rows=4, out_col="roll",
        )
        .to_pandas()
        .sort_values("uid", ignore_index=True)
    )
    want = df.sort_values(["k", "uid"])
    want = want.assign(
        roll=want.groupby("k")["v"].rolling(4, min_periods=1).sum().values
    ).sort_values("uid", ignore_index=True)
    assert list(got.roll) == [int(x) for x in want.roll]


def test_parse_urls_edge_cases(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.urltools import parse_urls

    df = pd.DataFrame(
        {
            "doc_id": range(6),
            "url": [
                "https://A.B.C:443/x?q=1#f",   # default port dropped, frag gone
                "http://h.io:80/",             # default http port dropped
                "http://h.io:8080",            # explicit port, root path
                "ftp://nope/x",                # unsupported scheme -> failed
                "https://h.io/a//b/",          # // keeps its empty segment
                "garbage",
            ],
        }
    )
    out = (
        parse_urls(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out.url_norm) == [
        "https://a.b.c/x?q=1",
        "http://h.io/",
        "http://h.io:8080/",
        "",
        "https://h.io/a//b/",
        "",
    ]
    assert list(out.port) == [-1, -1, 8080, -1, -1, -1]
    assert list(out.depth) == [1, 0, 0, 0, 3, 0]
    assert list(out.is_https) == [True, False, False, False, True, False]


def test_funnel_strict_order_and_dropoff(ray_session):
    """Pins the earliest-qualifying-event rule: a purchase BEFORE the
    first signup must not count; each step strictly after the user's
    previous-step time; drop-off is visible per step."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import funnel_counts

    T = pd.Timestamp
    rows = [
        # u1 completes all three in order
        (1, T("2024-01-01 00:00"), "signup"),
        (1, T("2024-01-01 01:00"), "purchase"),
        (1, T("2024-01-01 02:00"), "error"),
        # u2: purchase BEFORE signup -> stops at step 1
        (2, T("2024-01-01 01:00"), "signup"),
        (2, T("2024-01-01 00:00"), "purchase"),
        # u3: signup+purchase at the SAME instant -> strict > fails
        (3, T("2024-01-01 00:00"), "signup"),
        (3, T("2024-01-01 00:00"), "purchase"),
        # u4: never signs up -> counts nowhere
        (4, T("2024-01-01 00:00"), "purchase"),
        (4, T("2024-01-01 01:00"), "error"),
        # u5: signup, then error, then purchase -> error before the
        # purchase-step time does NOT count; stops at step 2
        (5, T("2024-01-01 00:00"), "signup"),
        (5, T("2024-01-01 01:00"), "error"),
        (5, T("2024-01-01 02:00"), "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    got = (
        funnel_counts(rd.from_pandas(df), ["signup", "purchase", "error"])
        .to_pandas().sort_values("step").reset_index(drop=True)
    )
    assert got["users"].tolist() == [4, 2, 1]


def test_cohort_retention_dropoff_and_cohort_split(ray_session):
    """Hand-built pin (the synthetic stream retains everyone): two
    cohorts, visible drop-off, a returning-after-gap user, and
    multiple events in one week counting once."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import cohort_retention

    W = 7 * 24 * 3600
    base = pd.Timestamp("2024-01-04")  # epoch week boundary-safe anchor
    rows = []
    def at(u, week, extra_s=0):
        rows.append((u, base + pd.Timedelta(seconds=week * W + extra_s)))
    at(1, 0); at(1, 0, 60); at(1, 1); at(1, 3)   # cohort c, offsets 0,1,3
    at(2, 0); at(2, 1)                            # cohort c, offsets 0,1
    at(3, 1); at(3, 2)                            # cohort c+1, offsets 0,1
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    got = (
        cohort_retention(rd.from_pandas(df))
        .to_pandas().sort_values(["cohort_bucket", "offset"]).reset_index(drop=True)
    )
    c = got["cohort_bucket"].min()
    want = {
        (c, 0): 2, (c, 1): 2, (c, 3): 1,   # u1+u2; u1 returns after a gap
        (c + 1, 0): 1, (c + 1, 1): 1,      # u3's own cohort
    }
    assert {(r.cohort_bucket, r.offset): r.users for r in got.itertuples()} == want
