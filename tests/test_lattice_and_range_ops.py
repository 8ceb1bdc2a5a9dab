"""Round-4 batch operators: exact-Jaccard prefix filtering, the
non-equi time-range self-join, rollup/cube/grouping-sets, declared
pivot, winsorize, strict-forward as-of, and group vocab overlap —
each pinned against a brute-force twin and invariant under input
partitioning."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _doc_frame(n=80, seed=11):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(n):
        words = list(rng.choice(vocab, size=rng.integers(6, 30)))
        rows.append({"doc_id": i, "text": " ".join(words)})
    # plant near-dup pairs: copy with one word appended / one dropped
    for i in range(0, 20, 2):
        base = rows[i]["text"].split(" ")
        rows.append({"doc_id": n + i, "text": " ".join(base + ["w0"])})
    return pd.DataFrame(rows)


def _brute_jaccard_pairs(df, threshold):
    from vlm_ocr_doc_reader_ray.stages.dedup import jaccard, word_shingles

    out = []
    recs = df.to_dict("records")
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            ia, ib = sorted([a["doc_id"], b["doc_id"]])
            ta = a["text"] if a["doc_id"] == ia else b["text"]
            tb = b["text"] if b["doc_id"] == ib else a["text"]
            jac = jaccard(word_shingles(ta), word_shingles(tb))
            if jac >= threshold:
                out.append({"id_a": ia, "id_b": ib, "jaccard": jac})
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


def test_jaccard_near_dups_equals_bruteforce(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.dedup import jaccard_near_dups

    df = _doc_frame()
    want = _brute_jaccard_pairs(df, 0.6).sort_values(
        ["id_a", "id_b"], ignore_index=True
    )
    assert len(want) >= 5  # the planted pairs must be present
    for nblocks in (1, 7):
        got = (
            jaccard_near_dups(
                rd.from_pandas(df).repartition(nblocks), threshold=0.6
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"id_a": "int64", "id_b": "int64"}), want
        )


def test_time_range_prior_count_boundaries(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import time_range_prior_count

    W = 600_000_000  # 10 min in us
    base = 1_700_000_000_000_000
    # crafted: exact lower-bound hit (included), equal ts (excluded),
    # just-outside (excluded), plus bucket-boundary crossers
    ts_us = np.array(
        [base, base + W, base + W + 1, base + 2 * W - 1, base + 2 * W - 1,
         base + 3 * W, base + 3 * W + 2, base - 1],
        dtype="int64",
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(ts_us), dtype="int64"),
            "ts": ts_us.view("datetime64[us]"),
        }
    )
    want = {
        r.event_id: int(
            ((ts_us >= r.ts_us - W) & (ts_us < r.ts_us)).sum()
        )
        for r in df.assign(ts_us=ts_us).itertuples()
    }
    for nblocks in (1, 5):
        got = (
            time_range_prior_count(
                rd.from_pandas(df).repartition(nblocks), "ts", "event_id", W
            )
            .to_pandas()
            .set_index("event_id")["n_prior"]
            .to_dict()
        )
        assert got == want


def test_time_range_prior_count_random_bruteforce(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import time_range_prior_count

    rng = np.random.default_rng(3)
    W = 1_000_000
    ts_us = np.sort(rng.integers(0, 40 * W, 500)).astype("int64")
    df = pd.DataFrame(
        {
            "event_id": np.arange(500, dtype="int64"),
            "ts": ts_us.view("datetime64[us]"),
        }
    )
    want = np.array(
        [((ts_us >= t - W) & (ts_us < t)).sum() for t in ts_us], dtype="int64"
    )
    got = (
        time_range_prior_count(rd.from_pandas(df).repartition(6), "ts", "event_id", W)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)["n_prior"]
        .to_numpy()
    )
    assert (got == want).all()


def test_rollup_and_cube_levels(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import cube_sums, rollup_sums

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y", "y"],
            "b": ["p", "q", "p", "p", "q"],
            "v": np.array([1, 2, 3, 4, 5], dtype="int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    r = rollup_sums(ds, ["a", "b"], ["v"], count_alias="n").to_pandas()
    # finest 4 + per-a 2 + grand 1
    assert len(r) == 7
    grand = r[(r.a == "ALL") & (r.b == "ALL")]
    assert grand.v.iloc[0] == 15 and grand.n.iloc[0] == 5
    ya = r[(r.a == "y") & (r.b == "ALL")]
    assert ya.v.iloc[0] == 12 and ya.n.iloc[0] == 3
    assert not ((r.a == "ALL") & (r.b != "ALL")).any()  # rollup: no b-only level

    c = cube_sums(ds, ["a", "b"], ["v"], count_alias="n").to_pandas()
    assert len(c) == 7 + 2  # + the b-only level
    bp = c[(c.a == "ALL") & (c.b == "p")]
    assert bp.v.iloc[0] == 8 and bp.n.iloc[0] == 3


def test_pivot_counts_declared_schema(ray_session):
    import pytest
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import pivot_counts

    df = pd.DataFrame({"g": ["a", "a", "b"], "p": ["u", "v", "u"]})
    got = (
        pivot_counts(rd.from_pandas(df), "g", "p", ["u", "v", "w"])
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    assert list(got.columns) == ["g", "n_u", "n_v", "n_w"]
    assert got.loc[0].tolist() == ["a", 1, 1, 0]
    assert got.loc[1].tolist() == ["b", 1, 0, 0]

    with pytest.raises(Exception, match="undeclared"):
        pivot_counts(rd.from_pandas(df), "g", "p", ["u"]).to_pandas()


def test_grouped_winsorize_bruteforce(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_winsorize

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 400),
            "v": rng.integers(0, 1000, 400).astype("int64"),
            "uid": np.arange(400, dtype="int64"),
        }
    )

    def disc_q(s, q):
        s = np.sort(s.to_numpy())
        return s[max(int(np.ceil(q * len(s))), 1) - 1]

    want = df.copy()
    for g, grp in df.groupby("g"):
        lo, hi = disc_q(grp.v, 0.1), disc_q(grp.v, 0.9)
        want.loc[grp.index, "v_winsorized"] = grp.v.clip(lo, hi)
    want["v_winsorized"] = want["v_winsorized"].astype("int64")

    got = (
        grouped_winsorize(rd.from_pandas(df).repartition(5), "g", "v", 0.1, 0.9)
        .to_pandas()
        .sort_values("uid", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["uid", "v_winsorized"]],
        want.sort_values("uid", ignore_index=True)[["uid", "v_winsorized"]],
    )


def test_asof_forward_strict(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import asof_join

    left = pd.DataFrame(
        {
            "id": np.array([1, 2, 3], dtype="int64"),
            "k": ["u", "u", "u"],
            "ts": pd.to_datetime(["2024-01-01 00:00:00",
                                  "2024-01-01 00:10:00",
                                  "2024-01-01 00:20:00"]),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.array([10, 20], dtype="int64"),
            "k": ["u", "u"],
            "rts": pd.to_datetime(["2024-01-01 00:10:00",
                                   "2024-01-01 00:25:00"]),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            "k", "k", "ts", "rts", direction="forward", allow_exact=False,
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    # id=2's ts EQUALS rid=10's — strict forward must skip to rid=20
    assert got.set_index("id")["rid"].to_dict() == {1: 10, 2: 20, 3: 20}


def test_group_vocab_overlap_bruteforce(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.dedup import group_vocab_overlap

    df = pd.DataFrame(
        {
            "source": ["s1", "s1", "s2", "s3"],
            "text": ["a b c", "c d", "c d e", "x y"],
        }
    )
    got = group_vocab_overlap(rd.from_pandas(df).repartition(3), "source", "text")
    # s1={a,b,c,d}, s2={c,d,e}, s3={x,y}: only (s1,s2) intersect
    assert len(got) == 1
    row = got.iloc[0]
    assert (row.source_a, row.source_b) == ("s1", "s2")
    assert row.n_shared == 2 and row.n_a == 4 and row.n_b == 3
    assert row.jaccard == 2 / 5
