"""HyperLogLog sketch: register determinism across partitionings,
estimate accuracy bounds (large-range raw + small-range linear
counting), and merge associativity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vlm_ocr_doc_reader_ray.stages.sketch import (
    _bit_length_u64,
    hll_estimate,
    hll_register_rows,
    hll_registers,
)


def test_bit_length_matches_python():
    rng = np.random.default_rng(3)
    xs = np.concatenate(
        [
            np.array([0, 1, 2, 3, 2**63, 2**64 - 1], dtype=np.uint64),
            rng.integers(0, 2**63, 200).astype(np.uint64),
        ]
    )
    got = _bit_length_u64(xs)
    want = np.array([int(x).bit_length() for x in xs], dtype=np.int64)
    assert (got == want).all()


def test_hll_registers_partition_invariant(ray_session):
    import ray.data as rd

    vals = pd.DataFrame({"v": [f"item-{i % 700}" for i in range(5000)]})
    outs = []
    for nblocks in (1, 11):
        outs.append(
            hll_registers(rd.from_pandas(vals).repartition(nblocks), "v", p=9)
            .to_pandas()
            .sort_values("bucket", ignore_index=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # and identical to the single-process computation
    local = hll_register_rows(vals["v"], 9).rename(columns={"rho": "rho_max"})
    pd.testing.assert_frame_equal(
        outs[0], local.sort_values("bucket", ignore_index=True)
    )


def test_hll_estimate_bounds():
    # p=9 → standard error 1.04/sqrt(512) ≈ 4.6%; assert 15% (3σ+)
    for n in (300, 5000, 100_000):  # linear-counting and raw regimes
        vals = pd.Series([f"u{i}" for i in range(n)])
        regs = hll_register_rows(vals, 9).rename(columns={"rho": "rho_max"})
        est = hll_estimate(regs, 9)
        assert abs(est - n) / n < 0.15, (n, est)


def test_hll_merge_associative():
    a = pd.Series([f"x{i}" for i in range(2000)])
    b = pd.Series([f"x{i}" for i in range(1000, 3000)])  # overlap
    ra = hll_register_rows(a, 9)
    rb = hll_register_rows(b, 9)
    merged = (
        pd.concat([ra, rb])
        .groupby("bucket", as_index=False)["rho"]
        .max()
        .rename(columns={"rho": "rho_max"})
    )
    whole = hll_register_rows(pd.concat([a, b]), 9).rename(
        columns={"rho": "rho_max"}
    )
    pd.testing.assert_frame_equal(
        merged.sort_values("bucket", ignore_index=True),
        whole.sort_values("bucket", ignore_index=True),
    )


def test_cms_estimate_never_underestimates(ray_session):
    import numpy as np
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.sketch import _cms_slots, cms_build

    rng = np.random.default_rng(7)
    keys = [f"k{int(i)}" for i in rng.zipf(1.5, 5000) % 300]
    df = pd.DataFrame({"k": keys})
    cms = cms_build(rd.from_pandas(df).repartition(6), "k", width=64, depth=3)
    true = df["k"].value_counts()
    ks = pd.Series(true.index)
    est = np.full(len(ks), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(3):
        est = np.minimum(est, cms[j, _cms_slots(ks, j, 64)])
    assert (est >= true.to_numpy()).all()
    # total mass per row equals the stream length
    assert (cms.sum(axis=1) == len(df)).all()


def test_heavy_hitters_exact_and_partition_invariant(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.sketch import heavy_hitters

    df = pd.DataFrame({"k": ["a"] * 50 + ["b"] * 49 + ["c"] * 10 + [f"u{i}" for i in range(200)]})
    # tiny sketch forces collisions: output must STILL be exact
    for blocks in (1, 7):
        out = (
            heavy_hitters(rd.from_pandas(df).repartition(blocks), "k",
                          threshold=49, width=8, depth=2)
            .to_pandas().sort_values("k", ignore_index=True)
        )
        assert list(out.k) == ["a", "b"]
        assert list(out.n) == [50, 49]


def test_heavy_hitters_empty_result_keeps_schema(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.sketch import heavy_hitters

    df = pd.DataFrame({"k": [f"u{i}" for i in range(100)]})
    out = heavy_hitters(rd.from_pandas(df), "k", threshold=5)
    # the sentinel keeps the exchange schema-stable: the DATASET knows
    # its columns even with zero surviving rows (Ray's to_pandas drops
    # columns on an all-empty dataset, so pin the schema on the
    # Dataset itself)
    assert sorted(out.schema().names) == ["k", "n"]
    assert out.count() == 0


def test_grouped_hll_estimates_within_bound(ray_session, sf_small):
    """Per-group estimates inherit the single-HLL error bound
    (~1.04/sqrt(512) ≈ 4.6% at p=9; allow 3 sigma) against exact
    per-language distinct text counts."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.sketch import grouped_distinct_hll

    docs = pd.read_parquet(f"{sf_small}/documents.parquet", columns=["lang", "text"])
    exact = docs.groupby("lang")["text"].nunique()
    got = grouped_distinct_hll(
        rd.read_parquet(f"{sf_small}/documents.parquet", columns=["lang", "text"]),
        "lang", "text", p=9,
    ).set_index("lang")["approx_distinct"]
    assert set(got.index) == set(exact.index)
    for lang, n in exact.items():
        assert abs(got[lang] - n) / n < 0.14, (lang, got[lang], n)
