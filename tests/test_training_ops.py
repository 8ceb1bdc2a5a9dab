"""Training-data ops not covered by the DuckDB gate (probabilistic
recall) + determinism pins for the hashing primitives."""

import numpy as np
import pandas as pd
import pytest

from vlm_ocr_doc_reader_ray.stages.dedup import (
    MinHasher,
    jaccard,
    simhash64,
    stable_u64,
    word_shingles,
)


def test_stable_hash_is_process_independent():
    # pinned values: if these move, signatures change across releases
    assert stable_u64("hello world") == stable_u64("hello world")
    assert stable_u64("a") != stable_u64("b")
    h = simhash64("the quick brown fox jumps over the lazy dog")
    assert h == simhash64("dog lazy the over jumps fox brown quick the")  # word-set invariant


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher(n_perm=128)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = jaccard(word_shingles(a), word_shingles(b))
    assert abs(est - true) < 0.25
    assert (mh.signature(a) == sa).all()  # deterministic


def test_minhash_finds_planted_rotations(ray_session, sf_small):
    """Corpus at reps=2 plants a rotated twin per doc; LSH must find
    high-jaccard pairs and every verified pair must be >= threshold."""
    import __ray_entry__ as m

    df = m.queries()["dedup_minhash_pairs"](sf_small).to_pandas()
    assert len(df) > 100  # hundreds of planted near-dup pairs
    assert (df["jaccard"] >= 0.8).all()


def test_minhash_truncation_policies(ray_session):
    """Bucket-cap visibility: identical texts overflow a tiny
    max_bucket; 'raise' (default) must fail loudly, 'flag' must carry
    a truncated column, 'ignore' must restore the silent behavior."""
    import pandas as pd
    import ray.data as rd
    from ray.exceptions import RayTaskError

    from vlm_ocr_doc_reader_ray.stages.dedup import minhash_near_dups

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = pd.DataFrame(
        {"doc_id": range(12), "text": [text] * 12}
    )
    ds = rd.from_pandas(docs)

    with pytest.raises((RayTaskError, RuntimeError), match="bucket cap truncated"):
        minhash_near_dups(ds, max_bucket=5).to_pandas()

    flagged = minhash_near_dups(ds, max_bucket=5, on_truncate="flag").to_pandas()
    assert "truncated" in flagged.columns and flagged["truncated"].all()

    silent = minhash_near_dups(ds, max_bucket=5, on_truncate="ignore").to_pandas()
    assert "truncated" not in silent.columns
    assert len(silent) == len(flagged) > 0

    # an uncapped run on the same data has no truncation -> raise mode
    # passes and finds all 66 pairs
    ok = minhash_near_dups(ds, max_bucket=200).to_pandas()
    assert len(ok) == 12 * 11 // 2


def test_simhash_pairs_deterministic(ray_session, sf_small):
    import __ray_entry__ as m

    a = m.queries()["dedup_simhash_pairs"](sf_small).to_pandas()
    b = m.queries()["dedup_simhash_pairs"](sf_small).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True), b.sort_values(key, ignore_index=True)
    )


def test_ann_lsh_overlaps_brute_force(ray_session, sf_small):
    """The bucketed path trades recall for fan-in: its hits must be a
    subset-quality approximation — every returned neighbour must
    appear in the exact top-20, and rank-1 self-hits must survive."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.similarity import (
        ann_brute_force,
        ann_lsh_bucketed,
        load_queries,
    )

    mat, ids = load_queries(sf_small, n_queries=5)
    emb = rd.read_parquet(f"{sf_small}/embeddings.parquet")
    exact = ann_brute_force(emb, mat, ids, k=20).to_pandas()
    approx = ann_lsh_bucketed(emb, mat, ids, k=5).to_pandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set).to_dict()
    for q, grp in approx.groupby("query_id"):
        # self-hit: the query vector is its own nearest neighbour and
        # shares its own bucket by construction
        assert grp.iloc[0]["vec_id"] == q
        overlap = len(set(grp["vec_id"]) & exact_sets[q]) / len(grp)
        assert overlap >= 0.4, (q, overlap)


def test_partitioned_hash_join_equals_pandas(ray_session, sf_small):
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    li = pd.read_parquet(f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = pd.read_parquet(f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    expected = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    got = partitioned_hash_join(
        rd.from_pandas(li), rd.from_pandas(orders), "l_orderkey", "o_orderkey", num_buckets=8
    ).to_pandas()
    cols = ["l_orderkey", "l_quantity", "o_orderkey", "o_orderpriority"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, ignore_index=True).astype(expected[cols].dtypes.to_dict()),
        expected[cols].sort_values(cols, ignore_index=True),
    )


def test_partitioned_hash_join_keeps_all_null_columns(ray_session):
    """A data column that is all-null inside one bucket must survive
    with its schema intact (regression: dropna(axis=1) used to eat
    it)."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "payload": [None, None, None, None]})
    right = pd.DataFrame({"rk": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    got = partitioned_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk", num_buckets=4
    ).to_pandas()
    assert sorted(got.columns) == ["k", "name", "payload", "rk"]
    assert len(got) == 4
    assert got["payload"].isna().all()


def test_media_resize_real_decode_and_failure_is_data():
    import numpy as np
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.extract.pngcodec import decode_png, encode_png
    from vlm_ocr_doc_reader_ray.stages.multimodal import ImageResizer, png_pixels

    good = encode_png(png_pixels(3))
    out = ImageResizer(target=(8, 8))(
        pa.table({"doc_id": pa.array([3, 4], type=pa.int64()),
                  "media": pa.array([good, b"not a png"])})
    )
    d = out.to_pydict()
    assert d["resize_status"] == ["ok", "failed"]
    assert d["in_w"][0] == png_pixels(3).shape[1]
    assert d["in_sum"][0] == int(png_pixels(3).astype(np.int64).sum())
    assert (d["out_w"], d["out_h"]) == ([8, 0], [8, 0])
    # the resized payload is itself a decodable PNG of the target shape
    small = decode_png(d["resized"][0])
    assert small.shape == (8, 8)
    assert d["out_sum"][0] == int(small.astype(np.int64).sum())
    assert d["in_sum"][1] == 0 and d["resized"][1] == b""


def test_wavcodec_roundtrip_and_scope_errors():
    import numpy as np
    import pytest

    from vlm_ocr_doc_reader_ray.extract.wavcodec import decode_wav, encode_wav

    s = np.array([-2000, 0, 1, -1, 1999], dtype=np.int16)
    data = encode_wav(s, 8000)
    back, rate = decode_wav(data)
    assert rate == 8000
    assert np.array_equal(back, s)
    # truncated payload raises (never a silently short signal)
    with pytest.raises(ValueError):
        decode_wav(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    # stereo / non-PCM is out of scope and must fail loudly
    import struct

    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = (b"RIFF" + (4 + 8 + 16).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + stereo_fmt)
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_audio_featurizer_known_values_and_failure_is_data():
    import numpy as np
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.extract.wavcodec import encode_wav
    from vlm_ocr_doc_reader_ray.stages.multimodal import AudioFeaturizer

    # hand-checkable signal: 4 samples at 1000 Hz
    s = np.array([-3, 5, 0, -2], dtype=np.int16)
    out = AudioFeaturizer()(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "media": pa.array([encode_wav(s, 1000), b"junk"],
                                    type=pa.large_binary())})
    ).to_pydict()
    assert out["audio_status"] == ["ok", "failed"]
    assert out["sample_rate"][0] == 1000
    assert out["n_samples"][0] == 4
    assert out["duration_ms"][0] == 4  # 4 * 1000 // 1000
    assert out["peak_abs"][0] == 5
    assert out["sum_abs"][0] == 10
    # sign pairs: (-,+) (+,+0) (0,-): crossings at 0->1 and 2->3
    assert out["n_zero_cross"][0] == 2
    assert out["sample_rate"][1] == 0 and out["sum_abs"][1] == 0


def test_audio_chunks_windows_and_tail(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.extract.wavcodec import encode_wav
    from vlm_ocr_doc_reader_ray.stages.multimodal import audio_chunks

    # 600 samples, chunk 256 → windows of 256, 256, 88
    s = (np.arange(600) % 7 - 3).astype(np.int16)
    tbl = pa.table(
        {"doc_id": pa.array([9, 10], type=pa.int64()),
         "media": pa.array([encode_wav(s, 8000), b"bad"],
                           type=pa.large_binary())}
    )
    out = audio_chunks(rd.from_arrow(tbl)).to_pandas()
    out = out.sort_values("chunk_idx", ignore_index=True)
    assert list(out["doc_id"]) == [9, 9, 9]  # corrupt doc drops
    assert list(out["n_samples"]) == [256, 256, 88]
    assert list(out["start"]) == [0, 256, 512]
    a = np.abs(s.astype(np.int64))
    for i, (lo, hi) in enumerate([(0, 256), (256, 512), (512, 600)]):
        assert out.loc[i, "sum_abs"] == int(a[lo:hi].sum())
        assert out.loc[i, "peak_abs"] == int(a[lo:hi].max())


def test_image_phash_known_value_and_invariance():
    import numpy as np
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.extract.pngcodec import encode_png
    from vlm_ocr_doc_reader_ray.stages.multimodal import ImagePHasher

    hasher = ImagePHasher()
    # 8×9 left-to-right ramp: every horizontal neighbor pair ascends,
    # so all 64 bits are set → both halves are 2^32 - 1
    ramp = np.tile(np.arange(9, dtype=np.uint8), (8, 1))
    out = hasher(
        pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "media": pa.array([encode_png(ramp)])})
    ).to_pydict()
    assert out["phash_hi"] == [2**32 - 1]
    assert out["phash_lo"] == [2**32 - 1]
    assert out["phash_status"] == ["ok"]
    # brightness-offset invariance (no wrap): +100 → identical hash
    shifted = hasher(
        pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "media": pa.array([encode_png(ramp + 100)])})
    ).to_pydict()
    assert shifted["phash_hi"] == out["phash_hi"]
    assert shifted["phash_lo"] == out["phash_lo"]
    # descending ramp → no bit set
    desc = hasher(
        pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "media": pa.array([encode_png(ramp[:, ::-1].copy())])})
    ).to_pydict()
    assert desc["phash_hi"] == [0] and desc["phash_lo"] == [0]
    # undecodable payload → sentinel hashes, failure is data
    bad = hasher(
        pa.table({"doc_id": pa.array([7], type=pa.int64()),
                  "media": pa.array([b"not a png"])})
    ).to_pydict()
    assert bad["phash_status"] == ["failed"]
    assert bad["phash_hi"] == [-1] and bad["phash_lo"] == [-1]


def test_phash_dedup_counts_and_partitioning_identity(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.extract.pngcodec import encode_png
    from vlm_ocr_doc_reader_ray.stages.multimodal import phash_dedup

    ramp = np.tile(np.arange(9, dtype=np.uint8), (8, 1))
    rows = [
        {"doc_id": 0, "media": encode_png(ramp)},
        {"doc_id": 1, "media": encode_png(ramp + 50)},   # same dHash
        {"doc_id": 2, "media": encode_png(ramp[:, ::-1].copy())},
        {"doc_id": 3, "media": b"truncated"},            # failed
        {"doc_id": 4, "media": b"also bad"},             # failed
    ]
    tbl = pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
         "media": pa.array([r["media"] for r in rows],
                           type=pa.large_binary())}
    )
    out = phash_dedup(rd.from_arrow(tbl)).to_pandas()
    got = out.set_index("doc_id")
    assert got.loc[0, "n_same"] == 2 and got.loc[1, "n_same"] == 2
    assert got.loc[2, "n_same"] == 1
    # failed rows never count as duplicates of each other
    assert got.loc[3, "n_same"] == 0 and got.loc[4, "n_same"] == 0
    assert set(got.loc[[3, 4], "phash_status"]) == {"failed"}
    b = phash_dedup(rd.from_arrow(tbl).repartition(3)).to_pandas()
    key = lambda d: d.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(key(out), key(b))


def test_phash_keep_canonical_and_keepcols_passthrough(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.extract.pngcodec import encode_png
    from vlm_ocr_doc_reader_ray.stages.multimodal import (
        phash_keep_canonical,
        resize_media,
    )

    ramp = np.tile(np.arange(9, dtype=np.uint8), (8, 1))
    rows = [
        (5, encode_png(ramp)),               # class A (brightness twin of 1)
        (1, encode_png(ramp + 50)),          # class A winner (min doc_id)
        (2, encode_png(ramp[:, ::-1].copy())),  # class B, singleton
        (3, b"truncated"),                   # failed: no perceptual identity
    ]
    tbl = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
         "media": pa.array([r[1] for r in rows], type=pa.large_binary())}
    )
    out = phash_keep_canonical(rd.from_arrow(tbl)).to_pandas()
    got = out.set_index("doc_id").sort_index()
    # one winner per perceptual class; corrupt doc 3 excluded entirely
    assert list(got.index) == [1, 2]
    assert got.loc[1, "n_same"] == 2 and got.loc[2, "n_same"] == 1
    # partitioning identity
    b = phash_keep_canonical(rd.from_arrow(tbl).repartition(3)).to_pandas()
    key = lambda d: d.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(key(out), key(b))
    # keep_cols ride through the resize stage unchanged
    res = resize_media(
        rd.from_arrow(
            tbl.append_column("tag", pa.array(["a", "b", "c", "d"]))
        ),
        keep_cols=["tag"],
    ).to_pandas().set_index("doc_id")
    assert list(res.loc[[5, 1, 2], "tag"]) == ["a", "b", "c"]
    assert res.loc[3, "resize_status"] == "failed" and res.loc[3, "tag"] == "d"


def test_pngcodec_roundtrip_and_filters():
    import struct
    import zlib

    import numpy as np

    from vlm_ocr_doc_reader_ray.extract import pngcodec

    rng = np.random.default_rng(7)
    for shape in [(5, 9), (17, 3, 3), (4, 4, 4), (1, 1), (2, 3, 2)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        b = pngcodec.decode_png(pngcodec.encode_png(a))
        assert b.shape == a.shape and (b == a).all()

    # every scanline filter type (1/Sub, 2/Up, 3/Average, 4/Paeth)
    # decoded against a straight-from-spec scalar reconstruction
    def make_png(h, w, ch, rows):
        color = {1: 0, 3: 2, 4: 6, 2: 4}[ch]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        raw = b"".join(bytes([f]) + bytes(line) for f, line in rows)
        return (pngcodec._SIG + pngcodec._chunk(b"IHDR", ihdr)
                + pngcodec._chunk(b"IDAT", zlib.compress(raw))
                + pngcodec._chunk(b"IEND", b""))

    def ref_unfilter(rows, w, ch):
        stride, out = w * ch, []
        for f, line in rows:
            rec, prior = [0] * stride, (out[-1] if out else [0] * stride)
            for i in range(stride):
                a_ = rec[i - ch] if i >= ch else 0
                b_ = prior[i]
                c_ = prior[i - ch] if i >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a_
                elif f == 2:
                    pred = b_
                elif f == 3:
                    pred = (a_ + b_) // 2
                else:
                    p = a_ + b_ - c_
                    pa_, pb_, pc_ = abs(p - a_), abs(p - b_), abs(p - c_)
                    pred = a_ if (pa_ <= pb_ and pa_ <= pc_) else (
                        b_ if pb_ <= pc_ else c_)
                rec[i] = (line[i] + pred) & 0xFF
            out.append(rec)
        return np.array(out, dtype=np.uint8)

    for ch in (1, 2, 3, 4):
        w, h = 6, 5
        rows = [(f % 5, rng.integers(0, 256, w * ch, dtype=np.uint8))
                for f in range(h)]
        got = pngcodec.decode_png(make_png(h, w, ch, rows))
        want = ref_unfilter(rows, w, ch)
        want = want.reshape(h, w, ch) if ch > 1 else want
        assert (got == want).all(), ch


def test_bilinear_resize_conventions():
    import numpy as np

    from vlm_ocr_doc_reader_ray.extract.pngcodec import resize_bilinear

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert (resize_bilinear(a, (8, 8)) == a).all()  # identity at same size
    c = np.full((5, 7), 77, np.uint8)
    assert (resize_bilinear(c, (3, 13)) == 77).all()  # constant preserved
    # pixel-center 2x upscale of [0,100]: clamped lerp 0,25,75,100
    r = resize_bilinear(np.array([[0, 100]], dtype=np.uint8), (1, 4))
    assert r.tolist() == [[0, 25, 75, 100]]


def test_bloom_filter_deterministic_and_bounded_fp():
    from vlm_ocr_doc_reader_ray.stages.relational import BloomFilter

    keys = [f"url-{i}" for i in range(5000)]
    bf = BloomFilter(len(keys))
    bf.add_many(keys)
    assert bf.might_contain(keys).all()  # no false negatives, ever
    others = [f"other-{i}" for i in range(50000)]
    assert bf.might_contain(others).mean() < 0.03  # ~1% FP design point
    bf2 = BloomFilter(len(keys))
    bf2.add_many(keys)
    assert (bf.bits == bf2.bits).all()  # process-stable bits


def test_bloom_anti_join_exact_equals_broadcast(ray_session, sf_small):
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import (
        bloom_anti_join,
        broadcast_anti_join,
    )

    cust = pd.read_parquet(f"{sf_small}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    keys = set(cust["c_custkey"].sample(frac=0.5, random_state=7))
    a = broadcast_anti_join(rd.from_pandas(cust), keys, "c_custkey").to_pandas()
    b = bloom_anti_join(rd.from_pandas(cust), keys, "c_custkey").to_pandas()
    cols = ["c_custkey", "c_name"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols, ignore_index=True),
        b[cols].sort_values(cols, ignore_index=True),
    )
    # approximate mode only ever drops EXTRA rows (FPs), never keeps a member
    c = bloom_anti_join(rd.from_pandas(cust), keys, "c_custkey", exact=False).to_pandas()
    assert set(c["c_custkey"]).isdisjoint(keys)
    assert len(c) <= len(a)


def test_bloom_from_dataset_matches_driver_build(ray_session):
    """Distributed per-block build + OR tree-merge produces the SAME
    bit array as inserting every key in one process — at any
    partitioning."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import (
        BloomFilter,
        bloom_from_dataset,
    )

    keys = [f"url-{i}" for i in range(4000)]
    ref = BloomFilter(4000)
    ref.add_many(keys)
    for nblocks in (1, 7):
        ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(nblocks)
        bf = bloom_from_dataset(ds, "k", capacity=4000)
        assert bf.m == ref.m and bf.k == ref.k
        assert (bf.bits == ref.bits).all()


def test_partitioned_anti_join_equals_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_anti_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, 3000), "v": np.arange(3000)}
    )
    right = pd.DataFrame({"rk": rng.integers(250, 750, 2000)})
    expect = left[~left["k"].isin(set(right["rk"]))]
    got = partitioned_anti_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        "k",
        "rk",
        num_parts=8,
    ).to_pandas()
    cols = ["k", "v"]
    pd.testing.assert_frame_equal(
        expect[cols].sort_values(cols, ignore_index=True),
        got[cols].sort_values(cols, ignore_index=True),
    )


def test_bloom_anti_join_dataset_exact_no_driver_keys(ray_session, sf_small):
    """The dataset-keyed bloom anti-join (distributed build + residual
    co-partitioned check) matches the broadcast anti-join exactly."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import (
        bloom_anti_join_dataset,
        broadcast_anti_join,
    )

    cust = pd.read_parquet(
        f"{sf_small}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    keys = cust["c_custkey"].sample(frac=0.5, random_state=7)
    a = broadcast_anti_join(
        rd.from_pandas(cust), set(keys), "c_custkey"
    ).to_pandas()
    key_ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(4)
    b = bloom_anti_join_dataset(
        rd.from_pandas(cust).repartition(4), key_ds, "c_custkey", "k",
        capacity=len(keys),
    ).to_pandas()
    cols = ["c_custkey", "c_name"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols, ignore_index=True),
        b[cols].sort_values(cols, ignore_index=True),
    )
    assert b["c_custkey"].dtype == cust["c_custkey"].dtype
    # approximate mode only ever drops EXTRA rows, never keeps a member
    c = bloom_anti_join_dataset(
        rd.from_pandas(cust), key_ds, "c_custkey", "k",
        capacity=len(keys), exact=False,
    ).to_pandas()
    assert set(c["c_custkey"]).isdisjoint(set(keys))
    assert len(c) <= len(a)


def test_ann_ivf_indexed_matches_recompute_and_prunes(ray_session, sf_small, tmp_path):
    """The persisted-index path returns bit-identical results to the
    recompute path and OPENS fewer files than the full index (the
    partition-pruning claim, measured via input_files)."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.similarity import (
        _normalize,
        _probe_sets,
        ann_ivf,
        ann_ivf_indexed,
        build_ivf_index,
        fixed_codebook,
        load_queries,
    )
    import numpy as np

    mat, ids = load_queries(sf_small, n_queries=6)
    cents = fixed_codebook(mat.shape[1], 16)
    emb = rd.read_parquet(
        f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(emb, cents, index_dir)

    a = ann_ivf(emb, mat, ids, cents, k=5, nprobe=3).to_pandas()
    b = ann_ivf_indexed(index_dir, mat, ids, cents, k=5, nprobe=3).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols, ignore_index=True),
        b[cols].sort_values(cols, ignore_index=True),
    )

    # pruning: the probed union is a strict subset of the 16 cells,
    # and the pruned read opens strictly fewer files
    probes = _probe_sets(
        _normalize(mat.astype(np.float64)), cents, 3
    )
    union = {str(c) for s in probes for c in s}
    assert len(union) < 16
    from ray.data.datasource.partitioning import PathPartitionFilter

    pf = PathPartitionFilter.of(lambda kv: kv.get("cell") in union, style="hive")
    n_pruned = len(rd.read_parquet(index_dir, partition_filter=pf).input_files())
    n_all = len(rd.read_parquet(index_dir).input_files())
    assert 0 < n_pruned < n_all


def test_ann_ivf_trained_overlaps_brute_force(ray_session, sf_small):
    """IVF with a TRAINED codebook (deterministic spherical k-means on
    the first-256 sample): deterministic across runs, self-hit
    preserved, and hits drawn from the exact top-20."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.similarity import (
        ann_brute_force,
        ann_ivf,
        load_queries,
        train_centroids,
    )

    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    sample = np.stack(
        t.to_pandas().sort_values("vec_id").head(256)["embedding"].to_numpy()
    )
    cents = train_centroids(sample, k=16)
    assert (train_centroids(sample, k=16) == cents).all()  # deterministic

    mat, ids = load_queries(sf_small, n_queries=5)
    emb = rd.read_parquet(f"{sf_small}/embeddings.parquet")
    exact = ann_brute_force(emb, mat, ids, k=20).to_pandas()
    approx = ann_ivf(emb, mat, ids, centroids=cents, k=5, nprobe=4).to_pandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set).to_dict()
    for q, grp in approx.groupby("query_id"):
        assert grp.iloc[0]["vec_id"] == q  # self-hit: query's own cell is probed
        overlap = len(set(grp["vec_id"]) & exact_sets[q]) / len(grp)
        assert overlap >= 0.4, (q, overlap)


def test_salted_join_equals_pandas_on_skew(ray_session):
    """Hot-key salting: declaring a skewed key spreads it over
    sub-buckets (left round-robin, right replicated) with output
    identical to the plain join / pandas merge."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    rng = np.arange(2000)
    left = pd.DataFrame({
        "k": np.where(rng % 2 == 0, 7, rng),   # half the rows share key 7
        "lv": rng,
    })
    right = pd.DataFrame({"rk": list(range(100)) + [7] * 3,
                          "rv": list(range(103))})
    expected = left.merge(right, left_on="k", right_on="rk")
    got = partitioned_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
        num_buckets=8, salt={7: 4},
    ).to_pandas()
    cols = ["k", "lv", "rk", "rv"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, ignore_index=True).astype(expected[cols].dtypes.to_dict()),
        expected[cols].sort_values(cols, ignore_index=True),
    )


@pytest.mark.slow
def test_salted_join_skew_invariant_across_parallelism(ray_session):
    """The hot-key replication contract at adversarial skew, across
    PROCESSES: one key carries 50% of the left rows; the join runs
    salted and unsalted in fresh Ray sessions at 2 and 16 CPUs, and
    every variant must hash identically to the pandas merge."""
    import hashlib
    import subprocess
    import sys

    import numpy as np
    import pandas as pd

    rng = np.arange(4000)
    left = pd.DataFrame({"k": np.where(rng % 2 == 0, 7, rng), "lv": rng})
    right = pd.DataFrame(
        {"rk": list(range(200)) + [7] * 5, "rv": list(range(205))}
    )
    expected = left.merge(right, left_on="k", right_on="rk")
    cols = ["k", "lv", "rk", "rv"]

    def canon_hash(df):
        c = df[cols].astype("int64").sort_values(cols, ignore_index=True)
        return hashlib.md5(c.to_csv(index=False).encode()).hexdigest()

    want = canon_hash(expected)

    script = r"""
import sys
import hashlib
import numpy as np
import pandas as pd
import ray
import ray.data as rd

ncpus = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, "/root/repo")
from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

rng = np.arange(4000)
left = pd.DataFrame({"k": np.where(rng % 2 == 0, 7, rng), "lv": rng})
right = pd.DataFrame({"rk": list(range(200)) + [7] * 5,
                      "rv": list(range(205))})
cols = ["k", "lv", "rk", "rv"]
for salt in (None, {7: 4}):
    got = partitioned_hash_join(
        rd.from_pandas(left).repartition(8),
        rd.from_pandas(right).repartition(3),
        "k", "rk", num_buckets=8, salt=salt,
    ).to_pandas()
    c = got[cols].astype("int64").sort_values(cols, ignore_index=True)
    print("HASH", "salted" if salt else "plain",
          hashlib.md5(c.to_csv(index=False).encode()).hexdigest())
ray.shutdown()
"""
    for ncpus in (2, 16):
        out = subprocess.run(
            [sys.executable, "-c", script, str(ncpus)],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        hashes = dict(
            line.split()[1:3]
            for line in out.stdout.splitlines()
            if line.startswith("HASH")
        )
        assert hashes == {"plain": want, "salted": want}, (ncpus, hashes, want)


def test_media_featurizer_deterministic_histogram(ray_session, sf_small):
    import numpy as np
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.multimodal import MediaFeaturizer, attach_media

    docs = rd.read_parquet(f"{sf_small}/documents.parquet").limit(50)
    feats = attach_media(docs).map_batches(
        MediaFeaturizer(), batch_format="pyarrow", batch_size=16
    ).to_pandas()
    assert len(feats) == 50
    m = np.stack(feats["features"].to_numpy())
    assert m.shape == (50, 16)
    np.testing.assert_allclose(m.sum(axis=1), 1.0)  # fractions sum to 1
    # process-stable: recompute equals
    feats2 = attach_media(docs).map_batches(
        MediaFeaturizer(), batch_format="pyarrow", batch_size=16
    ).to_pandas()
    m2 = np.stack(feats2.sort_values("doc_id")["features"].to_numpy())
    np.testing.assert_array_equal(
        np.stack(feats.sort_values("doc_id")["features"].to_numpy()), m2
    )


def test_partitioned_hash_join_preserves_int_dtypes(ray_session):
    """The pad/union must not leak float-widened columns into the join
    output (regression: a downstream join keyed on such a column
    hashed '102.0' != '102' and broke connected components)."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import partitioned_hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4] * 10, "lv": list(range(40))})
    right = pd.DataFrame({"rk": [1, 2, 3, 4], "rv": [10, 20, 30, 40]})
    got = partitioned_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk", num_buckets=4
    ).to_pandas()
    assert str(got["rv"].dtype) == "int64", got.dtypes
    assert str(got["lv"].dtype) == "int64", got.dtypes


def test_new_ops_invariant_under_partitioning(ray_session, sf_small):
    """as-of join, band join and clustering must produce identical
    results at different partition counts / block layouts (the
    engine's distribution-invariance contract)."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.dedup import cluster_pairs
    from vlm_ocr_doc_reader_ray.stages.relational import asof_join, band_join

    events = pd.read_parquet(f"{sf_small}/events.parquet", columns=["user_id", "ts"]).head(2000)
    orders = pd.read_parquet(
        f"{sf_small}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).drop_duplicates(["o_custkey", "o_orderdate"]).head(3000)

    def run_asof(nblocks, nparts):
        out = asof_join(
            rd.from_pandas(events).repartition(nblocks),
            rd.from_pandas(orders).repartition(nblocks),
            "user_id", "o_custkey", "ts", "o_orderdate", num_parts=nparts,
        ).to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(cols, ignore_index=True)

    a = run_asof(2, 4)
    b = run_asof(7, 16)
    pd.testing.assert_frame_equal(a, b)

    bands = pd.DataFrame({"band": ["lo", "hi"], "lo": [0.0, 200000.0],
                          "hi": [200000.0, None]})
    op = pd.read_parquet(f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def run_bands(nblocks):
        out = band_join(rd.from_pandas(op).repartition(nblocks), "o_totalprice", bands).to_pandas()
        return out.sort_values(["o_orderkey"], ignore_index=True)

    pd.testing.assert_frame_equal(run_bands(1), run_bands(9))

    pairs = pd.DataFrame({"id_a": [1, 2, 3, 4, 50], "id_b": [2, 3, 4, 5, 51]})

    def run_clusters(nblocks, nparts):
        return (
            cluster_pairs(rd.from_pandas(pairs).repartition(nblocks), num_blocks=nparts)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )

    pd.testing.assert_frame_equal(run_clusters(1, 2), run_clusters(5, 8))


def test_cluster_pairs_empty_pair_set(ray_session):
    """An empty pair set must yield an empty (doc_id, cluster) result
    with a stable schema — not a TypeError from the convergence
    checksum (Sum over an empty labels dataset returns None)."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.dedup import cluster_pairs

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    out = cluster_pairs(rd.from_pandas(empty))
    assert out.count() == 0
    sch = out.schema()
    assert sch.names == ["doc_id", "cluster"]
    assert [str(t) for t in sch.types] == ["int64", "int64"]


def test_auto_num_parts_scales_with_input(ray_session):
    """partitioned_apply's default partition count must grow with the
    estimated input size (fixed 32 would make one partition exceed a
    worker's heap at 100x data), while unknown-size lineages fall back
    to the floor without triggering execution."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        auto_num_parts,
        partitioned_apply,
    )

    big = pd.DataFrame(
        {"k": np.arange(200_000) % 1000, "v": np.arange(200_000, dtype="int64")}
    )
    ds = rd.from_pandas(big)

    # with a 64 KiB partition cap this ~3 MB input needs far more than
    # the 32-part floor — one fixed-32 partition would exceed the cap
    n = auto_num_parts(ds, floor=32, target_bytes=64 * 1024)
    assert n > 32, n

    # unknown-size lineage (post-transform metadata) -> floor, and the
    # estimate must not execute the plan to find out
    mapped = ds.map_batches(lambda b: b, batch_format="pandas")
    assert auto_num_parts(mapped, floor=32) == 32

    # default num_parts=None path still computes the right answer
    got = (
        partitioned_apply(ds, ["k"], lambda g: g.groupby("k", as_index=False)["v"].sum())
        .to_pandas().sort_values("k", ignore_index=True)
    )
    want = big.groupby("k", as_index=False)["v"].sum().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


def test_stratified_sample_rates_and_partition_invariance(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import (
        hash_sample,
        stratified_sample,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(4000),
            "lang": ["en", "zh", "fr", "de"] * 1000,
        }
    )
    out = stratified_sample(
        rd.from_pandas(df).repartition(5),
        "doc_id", "lang", {"en": 0.5, "zh": 0.1}, default_rate=0.0,
    ).to_pandas()
    by = out.groupby("lang").size()
    # zero-rate strata are dropped entirely; listed rates land near
    # their target (md5 is uniform; 1000 keys/stratum)
    assert set(by.index) <= {"en", "zh"}
    assert 400 <= by.get("en", 0) <= 600
    assert 60 <= by.get("zh", 0) <= 140
    # partitioning invariance: identical membership at 1 block
    out1 = stratified_sample(
        rd.from_pandas(df),
        "doc_id", "lang", {"en": 0.5, "zh": 0.1}, default_rate=0.0,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id", ignore_index=True),
        out1.sort_values("doc_id", ignore_index=True),
    )
    # a uniform rate table degenerates to hash_sample with the same seed
    uni = stratified_sample(
        rd.from_pandas(df), "doc_id", "lang", {}, default_rate=0.2,
        seed="sample",
    ).to_pandas()
    hs = hash_sample(rd.from_pandas(df), "doc_id", 0.2).to_pandas()
    assert sorted(uni.doc_id) == sorted(hs.doc_id)


def test_keep_canonical_min_id_survives(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.dedup import keep_canonical

    docs = rd.from_pandas(pd.DataFrame({"doc_id": range(10)}))
    # components {1,2,3} and {7,9}; 0,4,5,6,8 unclustered
    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": [2, 3, 9], "id_b": [1, 2, 7]})
    )
    out = (
        keep_canonical(docs, pairs)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert list(out.doc_id) == list(range(10))
    assert list(out.keep) == [
        True, True, False, False, True, True, True, True, True, False
    ]


def test_keep_canonical_empty_pairs_keeps_everything(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.dedup import keep_canonical

    docs = rd.from_pandas(pd.DataFrame({"doc_id": range(5)}))
    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                      "id_b": pd.Series([], dtype="int64")})
    )
    out = (
        keep_canonical(docs, pairs)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out.keep.all() and len(out) == 5


def test_salient_terms_integer_tfidf_order(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import salient_terms

    # doc 0: 'rare' and 'common' both tf=2 -> df breaks the tie toward
    # 'rare' (df 1 vs 3). docs 1/2: all tf=1 -> rarest word wins
    # ('solo', df 2, beats 'common'/'filler', df 3).
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "rare common rare common filler",
                "common solo filler",
                "common filler solo",
            ],
        }
    )
    out = (
        salient_terms(rd.from_pandas(df).repartition(3))
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert list(out.term) == ["rare", "solo", "solo"]
    assert list(out.tf) == [2, 1, 1]
    assert list(out.df) == [1, 2, 2]


def test_stratified_top_k_exact_budget_and_invariance(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import stratified_top_k

    df = pd.DataFrame(
        {
            "doc_id": range(300),
            "lang": (["en"] * 2 + ["zh"]) * 100,
        }
    )
    df.loc[df.index > 290, "lang"] = "rare"  # stratum smaller than k
    a = (
        stratified_top_k(rd.from_pandas(df).repartition(9), "doc_id", "lang", k=15)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    by = a.groupby("lang").size()
    assert by["en"] == 15 and by["zh"] == 15
    assert by["rare"] == (df.lang == "rare").sum()  # clamped, not padded
    b = (
        stratified_top_k(rd.from_pandas(df), "doc_id", "lang", k=15)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_exact_quantiles_matches_quantile_disc(ray_session):
    """Pin the histogram quantile rule to DuckDB quantile_disc:
    element at 1-based index max(ceil(q*n), 1) of the sorted column,
    including the q=0 clamp and q=1 max."""
    import duckdb
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import exact_quantiles

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 40, size=501)  # odd n, heavy duplication
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": vals})).repartition(7), "x", qs
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.sql(
        "SELECT unnest(?::DOUBLE[]) AS q, "
        "unnest(quantile_disc(x, ?::DOUBLE[])) AS value FROM t",
        params=[qs, qs],
    ).df()
    assert list(got["value"].astype("int64")) == list(want["value"].astype("int64"))


def test_global_sorted_rank_permutation_and_invariance(ray_session):
    """rank must be the 0..n-1 permutation given by md5-of-key order,
    identical at any block layout (training-order determinism)."""
    import hashlib

    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import global_sorted_rank

    df = pd.DataFrame({"doc_id": [f"d{i:04d}" for i in range(500)],
                       "payload": np.arange(500)})

    def run(nblocks):
        out = global_sorted_rank(
            rd.from_pandas(df).repartition(nblocks), "doc_id"
        ).to_pandas().sort_values("doc_id", ignore_index=True)
        return out

    a, b = run(1), run(11)
    pd.testing.assert_frame_equal(a, b)
    assert sorted(a["rank"]) == list(range(500))
    want = df.assign(
        rk=[hashlib.md5(f"shuffle:{k}".encode()).hexdigest() for k in df.doc_id]
    ).sort_values(["rk", "doc_id"], ignore_index=True)
    want["rank"] = np.arange(500, dtype="int64")
    want = want.drop(columns="rk").sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a[["doc_id", "payload", "rank"]],
                                  want[["doc_id", "payload", "rank"]],
                                  check_dtype=False)


def test_pack_sequences_invariants(ray_session):
    """Packing must conserve tokens (per-doc segment sums == doc
    length), fill every sequence but the last to exactly seq_len,
    split long docs across sequences, and be block-layout invariant."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import pack_sequences

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {"doc_id": range(200), "nw": rng.randint(1, 50, size=200)}
    )
    df.loc[7, "nw"] = 300   # straddles many 64-token sequences
    df.loc[9, "nw"] = 0     # dropped
    L = 64

    def run(nblocks):
        return (
            pack_sequences(rd.from_pandas(df).repartition(nblocks),
                           "doc_id", "nw", seq_len=L)
            .to_pandas()
            .sort_values(["seq_id", "off_in_seq"], ignore_index=True)
        )

    a, b = run(1), run(13)
    pd.testing.assert_frame_equal(a, b)

    per_doc = a.groupby("doc_id")["n_tokens"].sum()
    want = df[df.nw > 0].set_index("doc_id")["nw"]
    assert per_doc.sort_index().equals(want.sort_index().astype("int64"))
    assert 9 not in set(a.doc_id)
    assert (a[a.doc_id == 7].groupby("doc_id").size() >= 5).all()

    per_seq = a.groupby("seq_id")["n_tokens"].sum()
    full, last = per_seq.iloc[:-1], per_seq.iloc[-1]
    assert (full == L).all() and 0 < last <= L
    # segments within a sequence tile it contiguously from offset 0
    for _, g in a.groupby("seq_id"):
        g = g.sort_values("off_in_seq")
        assert g["off_in_seq"].iloc[0] == 0
        ends = (g["off_in_seq"] + g["n_tokens"]).to_numpy()
        assert (ends[:-1] == g["off_in_seq"].to_numpy()[1:]).all()


def test_write_training_shards_balanced_deterministic_resumable(
    ray_session, tmp_path
):
    """Shards must be balanced (docs_per_shard everywhere, short
    tail), byte-identical across block layouts and re-runs, and a
    re-run must skip finished shards (idempotent resume)."""
    import hashlib

    import ray.data as rd

    from vlm_ocr_doc_reader_ray.pipelines.shards import write_training_shards

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(103)],
                       "text": [f"t{i}" for i in range(103)]})

    def digest(d):
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(d.iterdir())
        }

    out_a = tmp_path / "a"
    m1 = write_training_shards(
        rd.from_pandas(df).repartition(7), "doc_id", str(out_a), 20
    )
    assert list(m1["rows"]) == [20, 20, 20, 20, 20, 3]
    assert not m1["skipped"].any()

    out_b = tmp_path / "b"
    write_training_shards(rd.from_pandas(df), "doc_id", str(out_b), 20)
    assert digest(out_a) == digest(out_b)  # layout-independent bytes

    # delete one shard, re-run: only that shard rewrites, bytes equal
    (out_a / "shard-00002.parquet").unlink()
    m2 = write_training_shards(
        rd.from_pandas(df).repartition(3), "doc_id", str(out_a), 20
    )
    assert m2["skipped"].sum() == 5 and len(m2) == 6
    assert not m2.loc[m2["shard"] == 2, "skipped"].any()
    assert digest(out_a) == digest(out_b)


def test_mixture_rebalance_counts_and_invariance(ray_session):
    """Replication must hit floor(w)/ceil(w) per row with the md5
    fraction deciding the extra copy (≈frac(w) of rows), default to
    1.0 for unknown groups, and be block-layout invariant."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import mixture_rebalance

    df = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(2000)],
         "grp": (["a"] * 2 + ["b"] + ["c"])  * 500}
    )
    w = {"a": 2.5, "b": 0.25}

    def run(nblocks):
        return (
            mixture_rebalance(rd.from_pandas(df).repartition(nblocks),
                              "doc_id", "grp", w)
            .to_pandas()
            .sort_values(["doc_id", "rep"], ignore_index=True)
        )

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(a, b)

    per_row = a.groupby(["doc_id", "grp"], as_index=False).size()
    by_grp = per_row.groupby("grp")["size"]
    assert set(by_grp.unique()["a"]) <= {2, 3}
    assert set(by_grp.unique()["b"]) <= {1}  # 0-copy rows vanish
    assert (by_grp.unique()["c"] == [1]).all()  # default weight 1.0
    # the fractional extra lands near frac(w) of the group
    n_a = (df.grp == "a").sum()
    extra = (per_row[per_row.grp == "a"]["size"] == 3).sum()
    assert abs(extra / n_a - 0.5) < 0.1
    n_b_kept = (a.grp == "b").sum()
    assert abs(n_b_kept / (df.grp == "b").sum() - 0.25) < 0.1
    # rep indexes are 0..reps-1 per row
    assert (a.groupby("doc_id")["rep"].max() + 1).equals(
        a.groupby("doc_id")["rep"].size()
    )


def test_token_budget_head_exact_and_prefix_of_packing(ray_session):
    """Kept tokens must sum to exactly the budget, exactly one doc is
    truncated, and the head is the same corpus prefix pack_sequences
    lays out first under the same seed."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import (
        pack_sequences,
        token_budget_head,
    )

    rng = np.random.RandomState(11)
    df = pd.DataFrame({"doc_id": range(300),
                       "nw": rng.randint(1, 40, size=300)})
    B = 1000
    head = token_budget_head(
        rd.from_pandas(df).repartition(5), "doc_id", "nw", budget=B
    ).to_pandas()
    assert head["n_tokens"].sum() == B
    assert head["truncated"].sum() == 1
    full = head[~head.truncated]
    assert (full["n_tokens"] == full["nw"]).all()

    # same seed => the packed token interval [0, B) covers exactly the
    # head's docs
    packed = pack_sequences(
        rd.from_pandas(df), "doc_id", "nw", seq_len=B, seed="shuffle"
    ).to_pandas()
    first_seq_docs = set(packed[packed.seq_id == 0].doc_id)
    assert first_seq_docs == set(head.doc_id)


def test_approx_quantiles_error_bound_and_determinism(ray_session):
    """Approximate quantiles must land within one bin width of the
    exact quantile (any distribution incl. heavy skew), be identical
    across block layouts, and collapse exactly for constant columns."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import approx_quantiles

    rng = np.random.RandomState(5)
    vals = np.concatenate([
        rng.lognormal(0, 2, size=20000),          # heavy right skew
        np.full(5000, 3.0),                       # a huge spike
    ])
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]

    def run(nblocks):
        return approx_quantiles(
            rd.from_pandas(pd.DataFrame({"x": vals})).repartition(nblocks),
            "x", qs, bins=4096,
        )

    a, b = run(3), run(17)
    pd.testing.assert_frame_equal(a, b)
    width = (vals.max() - vals.min()) / 4096
    for q, got, err in a.itertuples(index=False):
        exact = np.sort(vals)[max(int(np.ceil(q * len(vals))), 1) - 1]
        assert err == width
        assert abs(got - exact) <= width + 1e-12, (q, got, exact)

    const = approx_quantiles(
        rd.from_pandas(pd.DataFrame({"x": np.full(100, 7.5)})), "x", qs
    )
    assert (const["value"] == 7.5).all() and (const["err"] == 0).all()


def test_quantiles_ignore_nulls(ray_session):
    """SQL quantile aggregates ignore NULLs; the histogram paths must
    too (regression: NaN bin indexes used to land in bin 0 and skew
    every quantile toward the minimum)."""
    import duckdb
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        approx_quantiles,
        exact_quantiles,
        grouped_exact_quantiles,
    )

    df = pd.DataFrame({
        "x": [None] * 90 + list(range(100, 110)),
        "g": ["a"] * 50 + ["b"] * 50,
    })
    df["x"] = df["x"].astype("Int64")
    ds = rd.from_pandas(df).repartition(4)

    got = exact_quantiles(ds, "x", [0.5])
    want = duckdb.sql(
        "SELECT quantile_disc(x, 0.5) FROM df"
    ).fetchone()[0]
    assert int(got["value"].iloc[0]) == int(want)

    ap = approx_quantiles(ds, "x", [0.5], bins=4096)
    assert abs(float(ap["value"].iloc[0]) - float(want)) <= float(ap["err"].iloc[0]) + 1e-9

    # contract: a group with NO non-null values is omitted (SQL emits
    # a NULL-quantile row for it); groups with data must match exactly
    g = grouped_exact_quantiles(ds, "g", "x", [0.5]).to_pandas()
    gw = duckdb.sql(
        "SELECT g, quantile_disc(x, 0.5) v FROM df GROUP BY g ORDER BY g"
    ).df().dropna(subset=["v"])
    got_by_g = g.sort_values("g", ignore_index=True)
    assert list(got_by_g["g"]) == list(gw["g"])
    assert list(got_by_g["value"].astype("int64")) == list(gw["v"].astype("int64"))


def _naive_bpe(freqs, num_merges):
    """Textbook Sennrich Algorithm 1: recount all pairs each round."""
    from collections import Counter

    from vlm_ocr_doc_reader_ray.stages.bpe import END

    vocab = {}
    for w, n in zip(freqs["word"], freqs["n"]):
        key = tuple(w) + (END,)
        vocab[key] = vocab.get(key, 0) + int(n)
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, n in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1]); i += 2
                else:
                    out.append(sym[i]); i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_training_matches_naive_reference(ray_session):
    """Incremental pair bookkeeping must learn the EXACT merge list
    the textbook recount-everything algorithm learns, and the
    distributed word-count pass must be partitioning-invariant."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.bpe import (
        bpe_encode,
        bpe_segment,
        train_bpe,
        train_bpe_from_frequencies,
        word_frequencies,
    )

    rng = np.random.RandomState(13)
    words = ["low", "lower", "lowest", "new", "newer", "wide", "wider",
             "widest", "news", "newt"]
    docs = pd.DataFrame({
        "doc_id": range(120),
        "text": [" ".join(rng.choice(words, size=rng.randint(3, 12)))
                 for _ in range(120)],
    })

    freqs_a = word_frequencies(rd.from_pandas(docs).repartition(7))
    freqs_b = word_frequencies(rd.from_pandas(docs))
    pd.testing.assert_frame_equal(
        freqs_a.sort_values("word", ignore_index=True),
        freqs_b.sort_values("word", ignore_index=True),
    )

    got = train_bpe_from_frequencies(freqs_a, 30)
    want = _naive_bpe(freqs_a, 30)
    assert got == want

    merges = train_bpe(rd.from_pandas(docs).repartition(5), 30)
    assert merges == want

    # encoding: every learned merge applied greedily by rank; token
    # counts via the actor stage equal a sequential re-encode
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    enc = bpe_encode(rd.from_pandas(docs), merges).to_pandas()
    enc = enc.sort_values("doc_id", ignore_index=True)
    for _, row in docs.head(20).iterrows():
        n = sum(len(bpe_segment(w, ranks)) for w in row.text.split(" ") if w)
        assert int(enc.loc[enc.doc_id == row.doc_id, "bpe_len"].iloc[0]) == n


def test_bpe_edge_cases(ray_session):
    """Empty corpus trains zero merges; encoding with zero merges
    falls back to characters + end marker; single-word corpora
    terminate before num_merges."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.bpe import (
        END,
        bpe_encode,
        bpe_segment,
        train_bpe,
    )

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                         "text": pd.Series([], dtype="object")}))
    assert train_bpe(empty, 10) == []

    assert bpe_segment("abc", {}) == ["a", "b", "c", END]

    one = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["aa aa"]}))
    merges = train_bpe(one, 50)  # exhausts pairs long before 50
    assert 0 < len(merges) < 50
    enc = bpe_encode(one, merges).to_pandas()
    assert int(enc.bpe_len.iloc[0]) == 2  # each 'aa</w>' fully merged


def test_word_freq_score_top_vocab_cap(ray_session):
    """Capping the broadcast vocabulary zeroes out-of-table words but
    never changes in-table contributions; uncapped equals pandas."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import word_freq_score

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a b", "a b rare1 rare2", "rare1 rare2 rare3 rare4"],
    })
    full = word_freq_score(rd.from_pandas(df).repartition(2)).to_pandas()
    full = full.sort_values("doc_id", ignore_index=True)
    # doc 0: a(4 corpus-wide)x3 + b(2) = 14 over 4 words; doc 1:
    # a4+b2+rare1(2)+rare2(2)=10; doc 2: 2+2+1+1=6
    assert list(full.freq_sum) == [14, 10, 6]
    assert full.mean_freq.iloc[0] == 14 / 4

    capped = word_freq_score(
        rd.from_pandas(df), top_vocab=2  # keeps 'a'(4) and 'b'(2)
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(capped.freq_sum) == [14, 6, 0]


def test_fixed_merges_deterministic_pin():
    """The fixed tokenizer artifact must never drift: the SQL oracle
    embeds it literally, so a silent change would break every
    bpe_token_lengths gate. Pin size + the head of the list."""
    from vlm_ocr_doc_reader_ray.stages.bpe import FIXED_NUM_MERGES, fixed_merges

    m = fixed_merges()
    assert len(m) == FIXED_NUM_MERGES == 120
    assert m[:6] == [("e", "</w>"), ("t", "h"), ("th", "e</w>"),
                     ("i", "n"), ("t", "</w>"), ("a", "n")]
    assert m is fixed_merges() or m == fixed_merges()  # cached + stable


def test_curate_persist_modes_identical(ray_session, tmp_path):
    """persist='memory' (object-store pin) and persist='disk'
    (parquet spill checkpoint) are execution strategies, not
    semantics: identical packed output, any block layout."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.pipelines.curation import curate

    # texts must PASS the Gopher gate: include stopwords and keep
    # mean word length inside [3, 10]
    df = pd.DataFrame(
        {"doc_id": range(300),
         "text": [" ".join(
             "the" if j % 5 == 0 else f"word{(i * 7 + j) % 23}"
             for j in range(20 + i % 60))
             for i in range(300)],
         "lang": ["en", "zh", "fr"] * 100}
    )
    w = {"en": 0.5, "zh": 2.0}

    def run(persist):
        return (
            curate(rd.from_pandas(df).repartition(5), w, seq_len=64,
                   persist=persist, spill_dir=str(tmp_path))
            .to_pandas()
            .sort_values(["key", "seq_id"], ignore_index=True)
        )

    pd.testing.assert_frame_equal(run("memory"), run("disk"))


def test_checkpoint_concurrency_equals_sequential(ray_session, tmp_path):
    """The bounded partition pool must produce byte-identical output
    dirs to the sequential loop (determinism is the resume
    contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vlm_ocr_doc_reader_ray.pipelines.checkpoint import run_checkpointed

    files = []
    for i in range(6):
        p = tmp_path / f"in-{i}.parquet"
        docs = pd.DataFrame(
            {"url": [f"https://s.example.com/en/{i:04d}{j:04d}" for j in range(8)],
             "lang": ["en"] * 8,
             "html": [f"<html><body><p>doc {i} {j} words here now</p></body></html>"
                      .encode() for j in range(8)]}
        )
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), p)
        files.append(str(p))

    def table(root, sub):
        import os

        frames = []
        for part in sorted(os.listdir(root)):
            d = os.path.join(root, part, sub)
            if part.startswith("part-") and os.path.isdir(d):
                frames.append(pq.read_table(d).to_pandas())
        if not frames:  # e.g. entity-less corpus → no registry dirs
            return None
        out = pd.concat(frames, ignore_index=True)
        # sort by scalar key columns only (extracted carries nested
        # list columns that pandas cannot sort by)
        keys = [c for c in ("url", "entity_id", "page_num", "kind")
                if c in out.columns]
        return out.sort_values(keys, ignore_index=True)

    r_seq = run_checkpointed(files, str(tmp_path / "seq"), max_concurrent=1)
    r_con = run_checkpointed(files, str(tmp_path / "con"), max_concurrent=4)
    assert r_seq["ran"] == r_con["ran"] == list(range(6))
    for sub in ("extracted", "registry", "page_states"):
        a, b = table(tmp_path / "seq", sub), table(tmp_path / "con", sub)
        if a is None or b is None:
            assert a is None and b is None
            continue
        pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------------
# distributed k-means
# --------------------------------------------------------------------------

def test_kmeans_margin_guards_float_boundary(sf_small):
    """The kmeans oracle contract: centroids are bit-identical on both
    sides (integer-quantized sums), so the only cross-engine float
    freedom is the 64-term assignment dot product (~1e-15 relative).
    Pin that every vector's best-vs-second score gap stays >= 1e-9 at
    every iteration — 3+ orders of safety margin — on the SAME
    trajectory the queries run (kmeans_fit's "kmeans-init" seed, NOT
    fixed_codebook's IVF default; they diverge completely)."""
    import numpy as np
    import pyarrow.parquet as pq

    from vlm_ocr_doc_reader_ray.stages.similarity import fixed_codebook

    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    cents = {i: c for i, c in
             enumerate(fixed_codebook(emb.shape[1], 10, seed="kmeans-init"))}
    for _ in range(4):
        idxs = np.array(sorted(cents))
        mat = np.stack([cents[int(i)] for i in idxs])
        scores = 2.0 * (emb @ mat.T) - (mat * mat).sum(axis=1)
        s = np.sort(scores, axis=1)
        assert (s[:, -1] - s[:, -2]).min() > 1e-9
        assign = np.argmax(scores, axis=1)
        # medoid selection margin: best-vs-second member per cluster
        for j in range(len(idxs)):
            member_scores = np.sort(scores[assign == j, j])
            if len(member_scores) >= 2:
                assert member_scores[-1] - member_scores[-2] > 1e-9
        q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        new = {}
        for j, ci in enumerate(idxs):
            members = q[assign == j]
            if len(members):
                new[int(ci)] = members.sum(axis=0).astype(np.float64) / 1e6 / len(members)
        cents = new


def test_kmeans_drops_empty_clusters_and_matches_numpy(ray_session, sf_small):
    """Engine Lloyd's == single-process numpy Lloyd's (same init, same
    quantization), including the drop-empty-cluster rule: an init
    centroid at +100 everywhere (its |c|^2 penalty dwarfs any dot with
    unit-norm data) catches nothing and must vanish from the fit
    result, not linger stale."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.similarity import (
        fixed_codebook,
        kmeans_assign,
        kmeans_fit,
    )

    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    vec_ids = t["vec_id"].to_numpy()
    init = np.vstack([fixed_codebook(emb.shape[1], 3),
                      np.full(emb.shape[1], 100.0)])

    ds = rd.read_parquet(f"{sf_small}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = kmeans_fit(ds, k=4, iters=2, init=init)

    cents = {i: init[i].astype(np.float64) for i in range(4)}
    for _ in range(2):
        idxs = np.array(sorted(cents))
        mat = np.stack([cents[int(i)] for i in idxs])
        scores = 2.0 * (emb @ mat.T) - (mat * mat).sum(axis=1)
        assign = np.argmax(scores, axis=1)
        q = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        new = {}
        for j, ci in enumerate(idxs):
            members = q[assign == j]
            if len(members):
                new[int(ci)] = members.sum(axis=0).astype(np.float64) / 1e6 / len(members)
        cents = new

    assert set(got) == set(cents)
    assert 3 not in got  # the far-away init emptied out and was dropped
    for c in got:
        np.testing.assert_array_equal(got[c], cents[c])  # bit-exact

    tagged = kmeans_assign(ds, got).to_pandas().sort_values("vec_id")
    idxs = np.array(sorted(cents))
    mat = np.stack([cents[int(i)] for i in idxs])
    want = idxs[np.argmax(2.0 * (emb @ mat.T) - (mat * mat).sum(axis=1), axis=1)]
    order = np.argsort(vec_ids)
    np.testing.assert_array_equal(tagged["cluster"].to_numpy(), want[order])


def test_grouped_quantile_gate_modes_and_nulls(ray_session):
    """keep= modes against a hand-checked frame; a group whose values
    are all NULL has no threshold -> its rows drop (SQL inner-join
    convention); NULL values inside a live group never pass."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_quantile_gate

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", "b", "b", "n", "n"],
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, None, None, None],
            "id": range(8),
        }
    )
    ds = rd.from_pandas(df)
    # quantile_disc(0.5): a -> 2 (ceil(.5*4)=2nd of [1,2,3,4]), b -> 10
    ge = grouped_quantile_gate(ds, "g", "v", q=0.5, keep="ge").to_pandas()
    assert sorted(ge["id"]) == [1, 2, 3, 4]
    lt = grouped_quantile_gate(ds, "g", "v", q=0.5, keep="lt").to_pandas()
    assert sorted(lt["id"]) == [0]
    gt = grouped_quantile_gate(ds, "g", "v", q=0.5, keep="gt").to_pandas()
    assert sorted(gt["id"]) == [2, 3]
    le = grouped_quantile_gate(ds, "g", "v", q=0.5, keep="le").to_pandas()
    assert sorted(le["id"]) == [0, 1, 4]


def test_grouped_percentile_rank_bit_equals_cume_dist(ray_session):
    """Rank arithmetic is integer until one IEEE division, so the
    histogram path must equal the window function BIT-FOR-BIT,
    including ties and a single-value group."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_percentile_rank

    df = pd.DataFrame(
        {
            "g": ["a"] * 7 + ["b"] * 3 + ["c"],
            "v": [5, 1, 5, 2, 2, 2, 9, 4, 4, 4, 0],
            "id": range(11),
        }
    )
    got = (
        grouped_percentile_rank(rd.from_pandas(df), "g", "v")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT id, cume_dist() OVER (PARTITION BY g ORDER BY v) AS pct FROM t"
    ).df().sort_values("id").reset_index(drop=True)
    assert (got["pct"].to_numpy() == want["pct"].to_numpy()).all()
    assert got.loc[got["id"] == 10, "pct"].item() == 1.0


def test_importance_log_ratio_prefers_target(ray_session, sf_small):
    """The smoothed log-likelihood ratio must rank target-language
    docs above every other language on average (the DSIR selection
    property), and must equal a single-process numpy recompute of the
    same formula."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import (
        _hashed_word_buckets,
        importance_count_tables,
        importance_scores,
    )

    docs = rd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    t, s = importance_count_tables(docs, lambda b: (b["lang"] == "en").to_numpy())
    out = importance_scores(docs, t, s).to_pandas()

    pdf = pd.read_parquet(f"{sf_small}/documents.parquet",
                          columns=["doc_id", "lang", "text"])
    means = out.merge(pdf[["doc_id", "lang"]], on="doc_id").groupby("lang")[
        "log_ratio"].mean()
    assert means.idxmax() == "en"

    # single-process recompute of one doc's log_ratio
    nb = len(s)
    alpha = 1.0
    lr = (np.log((t + alpha) / (np.float64(t.sum()) + alpha * nb))
          - np.log((s + alpha) / (np.float64(s.sum()) + alpha * nb)))
    row = pdf.iloc[7]
    buckets, _ = _hashed_word_buckets([row["text"]], nb)
    want = lr[buckets].sum()
    got = out.loc[out["doc_id"] == row["doc_id"], "log_ratio"].item()
    assert abs(got - want) < 1e-9


def test_grouped_zscore_exactness_and_degenerate_groups(ray_session):
    """Moments from integer sums: z must match a float64 recompute of
    the same expression; a zero-variance group and a single-row group
    must emit NULL z (never inf)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import grouped_zscore

    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["flat"] * 3 + ["solo"],
            "v": [1, 2, 3, 10, 7, 7, 7, 42],
            "id": range(8),
        }
    )
    got = (
        grouped_zscore(rd.from_pandas(df), "g", "v", keep_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    a = df[df.g == "a"]["v"].to_numpy(dtype=np.float64)
    n, s, s2 = np.float64(4), a.sum(), (a * a).sum()
    want = (a - s / n) / np.sqrt((s2 - s * s / n) / n)
    assert (got.loc[got.g == "a", "z"].to_numpy() == want).all()
    assert got.loc[got.g == "flat", "z"].isna().all()
    assert got.loc[got.g == "solo", "z"].isna().all()


def test_grouped_token_cap_matches_naive(ray_session):
    """Multi-block exactness of the per-group token cap: the
    exclusive-prefix local combiner must reproduce the single-process
    prefix semantics (keep while inclusive cumsum <= budget; first
    crossing doc and everything after drop) at any block layout —
    the inclusive-prefix prune would wrongly re-admit short docs
    ranked after a long dropped one."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import grouped_token_cap

    rng = np.random.default_rng(11)
    rows = [
        {
            "doc_id": int(i),
            "grp": f"g{int(rng.integers(0, 5))}",
            "n_tokens": int(rng.integers(1, 900)),
        }
        for i in range(400)
    ]
    budget = 2000
    # naive single-process reference
    want: set[int] = set()
    for g in {r["grp"] for r in rows}:
        members = sorted(
            (r for r in rows if r["grp"] == g),
            key=lambda r: (
                hashlib.md5(f"hostcap:{r['doc_id']}".encode()).hexdigest(),
                r["doc_id"],
            ),
        )
        cum = 0
        for r in members:
            cum += r["n_tokens"]
            if cum > budget:
                break
            want.add(r["doc_id"])
    for nblocks in (1, 7, 40):
        ds = rd.from_items(rows).repartition(nblocks)
        got = set(
            grouped_token_cap(ds, "grp", "doc_id", "n_tokens", budget)
            .to_pandas()["doc_id"]
        )
        assert got == want, (nblocks, len(got), len(want))


def test_bpe_fertility_by_group_matches_manual(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.bpe import (
        BpeEncoder,
        bpe_fertility_by_group,
        fixed_merges,
    )

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["the fast data", "spark row", "the the the", "a b"],
            "source": ["web", "web", "news", "news"],
        }
    )
    out = (
        bpe_fertility_by_group(rd.from_pandas(df).repartition(3), fixed_merges())
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    # manual recount with the same encoder
    enc = BpeEncoder(fixed_merges())
    lens = {
        i: sum(len(enc._seg(w)) for w in t.split(" ") if w)
        for i, t in zip(df.doc_id, df.text)
    }
    words = {i: len(t.split(" ")) for i, t in zip(df.doc_id, df.text)}
    for _, row in out.iterrows():
        ids = df.doc_id[df.source == row.source]
        t = sum(lens[i] for i in ids)
        w = sum(words[i] for i in ids)
        assert row.n_docs == len(ids)
        assert row.n_words == w
        assert row.n_tokens == t
        assert row.fertility_ppm == (t * 2_000_000 + w) // (2 * w)


def test_doc_tiers_reason_precedence_and_partition_invariance(
    ray_session, sf_small
):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.pipelines.curation import doc_tiers

    docs = rd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    a = doc_tiers(docs).to_pandas().sort_values("doc_id", ignore_index=True)
    b = (
        doc_tiers(docs.repartition(9))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == docs.count()
    # reason precedence: quality dominates, then repetition, then
    # entropy; 'ok' rows carry a non-drop tier, failures carry 'drop'
    assert set(a.loc[~a.quality_pass, "reason"]) <= {"quality"}
    assert set(
        a.loc[a.quality_pass & ~a.gopher_pass, "reason"]
    ) <= {"repetition"}
    assert set(
        a.loc[a.quality_pass & a.gopher_pass & ~a.entropy_pass, "reason"]
    ) <= {"entropy"}
    ok = a.reason == "ok"
    assert set(a.loc[ok, "tier"]) <= {"high", "mid", "low"}
    assert (a.loc[~ok, "tier"] == "drop").all()
    # tier follows the bucket for surviving docs
    m = {"head": "high", "middle": "mid", "tail": "low"}
    assert (a.loc[ok, "bucket"].map(m) == a.loc[ok, "tier"]).all()


def test_quality_filter_lean_equals_full(ray_session, sf_small):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import quality_filter

    docs = rd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    cols = ["doc_id", "n_words", "mean_word_len", "symbol_ratio",
            "stopword_ratio", "quality_pass"]
    full = (
        quality_filter(docs).select_columns(cols)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    lean = (
        quality_filter(docs, lean=True).select_columns(cols)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(full, lean)


def test_tiered_token_budget_caps_bite_and_invariance(ray_session, sf_small):
    import hashlib

    import ray.data as rd

    from vlm_ocr_doc_reader_ray.pipelines.curation import (
        doc_tiers,
        tiered_token_budget,
    )

    docs = rd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    budgets = {"high": 6000, "mid": 3000, "low": 1000}
    a = (
        tiered_token_budget(docs, budgets)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    b = (
        tiered_token_budget(docs.repartition(6), budgets)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    sums = a.groupby("tier")["n_words"].sum()
    for t, bud in budgets.items():
        assert sums.get(t, 0) <= bud
    # each tier is the exact md5-order prefix of the labeled eligible set
    labeled = doc_tiers(docs).to_pandas()
    for t, bud in budgets.items():
        grp = labeled[labeled.tier == t].copy()
        grp["rk"] = [
            hashlib.md5(f"tiercap:{v}".encode()).hexdigest()
            for v in grp.doc_id
        ]
        grp = grp.sort_values(["rk", "doc_id"])
        keep = grp[grp.n_words.cumsum() <= bud]
        assert sorted(keep.doc_id) == sorted(a.loc[a.tier == t, "doc_id"])
