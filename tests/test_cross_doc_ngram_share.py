"""cross_doc_ngram_share: brute-force twin + partitioning invariance
+ the zero-gram-doc contract (docs shorter than n words score 0/0/0)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _brute(df, n=5):
    grams = {}
    per_doc = {}
    for r in df.itertuples():
        ws = r.text.split(" ")
        gs = {
            " ".join(ws[i : i + n])
            for i in range(len(ws) - n + 1)
        } if len(ws) >= n else set()
        per_doc[r.doc_id] = gs
        for g in gs:
            grams.setdefault(g, set()).add(r.doc_id)
    rows = []
    for did, gs in per_doc.items():
        nn = len(gs)
        sh = sum(1 for g in gs if len(grams[g]) >= 2)
        ppm = (sh * 2_000_000 + nn) // (2 * nn) if nn else 0
        rows.append(
            {"doc_id": did, "n_ngrams": nn, "n_shared": sh, "shared_ppm": ppm}
        )
    return (
        pd.DataFrame(rows)
        .astype("int64")
        .sort_values("doc_id", ignore_index=True)
    )


def test_cross_doc_ngram_share_bruteforce(ray_session):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.scrub import cross_doc_ngram_share

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocab, size=rng.integers(2, 25))),
            }
        )
    # planted: two docs sharing an exact 8-word run (5-grams collide),
    # plus a doc too short to have any 5-gram (the 0/0/0 contract)
    run = " ".join(rng.choice(vocab, size=8))
    rows.append({"doc_id": 100, "text": run + " w0 w1"})
    rows.append({"doc_id": 101, "text": "w5 " + run})
    rows.append({"doc_id": 102, "text": "w1 w2 w3"})
    df = pd.DataFrame(rows)

    want = _brute(df)
    planted = want.set_index("doc_id")
    assert planted.loc[100, "n_shared"] >= 4  # the shared run's 5-grams
    assert planted.loc[102].tolist() == [0, 0, 0]

    from vlm_ocr_doc_reader_ray.stages.scrub import cross_doc_ngram_share

    for nblocks in (1, 9):
        got = (
            cross_doc_ngram_share(
                rd.from_pandas(df).repartition(nblocks), "text", "doc_id", 5
            )
            .to_pandas()
            .astype("int64")
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)
