"""Semantics of the round-4 retrieval/split batch: latest_by_key
(recrawl collapse), host_holdout (leakage-free split), bm25_search.

The DuckDB-oracle parity for the driver queries is covered by
test_queries_vs_duckdb.py's auto-parametrization; these pin the
operator CONTRACTS (winner rule, disjointness, subset stability,
parallelism invariance) on hand-built fixtures.
"""

from __future__ import annotations

import pandas as pd
import pytest


def _pdf(ds):
    return ds.to_pandas()


class TestLatestByKey:
    def _fixture(self):
        import ray.data as rd

        rows = pd.DataFrame(
            {
                "url": ["a", "b", "a", "c", "b", "a"],
                "ts": [3, 10, 7, 1, 2, 5],
                "payload": ["a3", "b10", "a7", "c1", "b2", "a5"],
            }
        )
        return rd.from_pandas(rows)

    def test_winner_per_key(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.relational import latest_by_key

        out = _pdf(latest_by_key(self._fixture(), "url", "ts"))
        got = dict(zip(out["url"], out["payload"]))
        assert got == {"a": "a7", "b": "b10", "c": "c1"}

    def test_identity_under_partitioning(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.relational import latest_by_key

        base = self._fixture()
        a = _pdf(latest_by_key(base, "url", "ts"))
        b = _pdf(latest_by_key(base.repartition(5), "url", "ts"))
        key = lambda d: d.sort_values("url", ignore_index=True)
        pd.testing.assert_frame_equal(key(a), key(b))


class TestHostHoldout:
    def test_split_rule_and_disjointness(self, ray_session, sf_small):
        from vlm_ocr_doc_reader_ray.pipelines.extraction import read_corpus
        from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64
        from vlm_ocr_doc_reader_ray.stages.host_stats import host_holdout

        out = _pdf(host_holdout(read_corpus(sf_small)))
        # one row per host => structurally disjoint; rule recomputed
        assert out["host"].is_unique
        for _, r in out.iterrows():
            want = (
                "valid" if md5_u64(f"holdout:{r['host']}") % 10 == 0 else "train"
            )
            assert r["split"] == want
        assert set(out["split"]) <= {"train", "valid"}
        assert (out["n_docs"] > 0).all()

    def test_subset_stability(self, ray_session, sf_small):
        """A host keeps its side when the corpus is subset — the
        incremental-crawl property the hash rule exists for."""
        from vlm_ocr_doc_reader_ray.pipelines.extraction import read_corpus
        from vlm_ocr_doc_reader_ray.stages.host_stats import host_holdout

        full = _pdf(host_holdout(read_corpus(sf_small)))
        half_corpus = read_corpus(sf_small).filter(
            lambda row: int(row["url"][-1]) % 2 == 0
        )
        half = _pdf(host_holdout(half_corpus))
        assert 0 < len(half) <= len(full)
        merged = half.merge(full, on="host", suffixes=("_half", "_full"))
        assert len(merged) == len(half)
        assert (merged["split_half"] == merged["split_full"]).all()


class TestBm25:
    def _docs(self):
        import ray.data as rd

        # doc 1: dense in 'cat'; doc 2: one 'cat' in a long doc;
        # doc 3: one 'cat' in a short doc; doc 4: no 'cat'.
        rows = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "cat cat cat dog",
                    "cat " + " ".join(["filler"] * 40),
                    "cat dog",
                    "dog dog dog",
                ],
            }
        )
        return rd.from_pandas(rows)

    def test_ranking_semantics(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import bm25_search

        out = _pdf(bm25_search(self._docs(), {1: ["cat"]}, k=10))
        out = out.sort_values("rank")
        # only docs containing the term appear
        assert set(out["doc_id"]) == {1, 2, 3}
        # higher tf wins; among tf=1, shorter doc wins (length norm)
        assert list(out["doc_id"]) == [1, 3, 2]
        assert (out["score"] > 0).all()

    def test_k_truncation_and_ties(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import bm25_search

        rows = pd.DataFrame(
            {"doc_id": list(range(20)), "text": ["x y"] * 20}
        )
        out = _pdf(bm25_search(rd.from_pandas(rows), {7: ["x"]}, k=5))
        # identical docs => identical scores; ties break by doc_id
        assert list(out.sort_values("rank")["doc_id"]) == [0, 1, 2, 3, 4]
        assert out["score"].nunique() == 1

    def test_identity_under_partitioning(self, ray_session, sf_small):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import bm25_search

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        q = {1: ["sort", "stream"], 2: ["customer"]}
        a = _pdf(bm25_search(docs, q, k=10))
        b = _pdf(bm25_search(docs.repartition(13), q, k=10))
        key = lambda d: d.sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        pd.testing.assert_frame_equal(key(a), key(b))


class TestHostPagerank:
    def _links(self):
        import ray.data as rd

        # a -> b (twice), b -> a, c -> a; d is linked but never links
        rows = pd.DataFrame(
            {
                "url": [
                    "https://a.ex/1", "https://a.ex/1",
                    "https://b.ex/1", "https://c.ex/1",
                    "https://a.ex/2",
                ],
                "href": [
                    "https://b.ex/x", "https://b.ex/y",
                    "https://a.ex/x", "https://a.ex/y",
                    "https://d.ex/x",
                ],
            }
        )
        return rd.from_pandas(rows)

    def test_recurrence_by_hand(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_pagerank

        out = _pdf(host_pagerank(self._links(), iters=1)).set_index("host")
        # outdeg: a.ex=3, b.ex=1, c.ex=1. s0 = 1_000_000 each.
        # s1(b) = 150000 + 85*(2*(1000000//3))//100
        # s1(a) = 150000 + 85*(1*1000000 + 1*1000000)//100
        # s1(d) = 150000 + 85*(1*(1000000//3))//100 ; s1(c) = 150000
        assert out.loc["b.ex", "pagerank"] == 150000 + (85 * 2 * 333333) // 100
        assert out.loc["a.ex", "pagerank"] == 150000 + (85 * 2000000) // 100
        assert out.loc["d.ex", "pagerank"] == 150000 + (85 * 333333) // 100
        assert out.loc["c.ex", "pagerank"] == 150000

    def test_identity_under_partitioning(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_pagerank

        a = _pdf(host_pagerank(self._links(), iters=2))
        b = _pdf(host_pagerank(self._links().repartition(4), iters=2))
        srt = lambda d: d.sort_values("host", ignore_index=True)
        pd.testing.assert_frame_equal(srt(a), srt(b))

    def test_bounded_magnitude(self, ray_session):
        """PageRank normalization keeps scores bounded across
        iterations (the host_authority cnt^k growth does not)."""
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_pagerank

        out = _pdf(host_pagerank(self._links(), iters=5))
        assert (out["pagerank"] < 10_000_000).all()
        assert (out["pagerank"] >= 150000).all()


class TestHostPagerankConverged:
    _links = TestHostPagerank._links

    def test_scores_equal_fixed_variant_at_chosen_k(self, ray_session):
        """The data-dependent stopping rule must land on EXACTLY the
        fixed-iteration scores for the k it chose — the folded delta
        legs may not perturb the score recurrence."""
        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            host_pagerank,
            host_pagerank_converged,
        )

        conv = _pdf(host_pagerank_converged(self._links(), max_iters=12))
        k = int(conv["n_iters"].iloc[0])
        assert (conv["n_iters"] == k).all()
        fixed = _pdf(host_pagerank(self._links(), iters=k))
        srt = lambda d: d.sort_values("host", ignore_index=True)
        pd.testing.assert_frame_equal(
            srt(conv)[["host", "pagerank"]], srt(fixed)[["host", "pagerank"]]
        )

    def test_max_iters_caps_the_loop(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            host_pagerank,
            host_pagerank_converged,
        )

        out = _pdf(
            host_pagerank_converged(self._links(), tol=0, max_iters=1)
        )
        assert (out["n_iters"] == 1).all()
        fixed = _pdf(host_pagerank(self._links(), iters=1))
        srt = lambda d: d.sort_values("host", ignore_index=True)
        pd.testing.assert_frame_equal(
            srt(out)[["host", "pagerank"]], srt(fixed)[["host", "pagerank"]]
        )

    def test_huge_tol_stops_after_one_superstep(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            host_pagerank_converged,
        )

        out = _pdf(
            host_pagerank_converged(
                self._links(), tol=10_000_000, max_iters=8
            )
        )
        assert (out["n_iters"] == 1).all()

    def test_identity_under_partitioning(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            host_pagerank_converged,
        )

        a = _pdf(host_pagerank_converged(self._links(), max_iters=6))
        b = _pdf(
            host_pagerank_converged(
                self._links().repartition(4), max_iters=6
            )
        )
        srt = lambda d: d.sort_values("host", ignore_index=True)
        pd.testing.assert_frame_equal(srt(a), srt(b))

    def test_empty_schema_stable(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            host_pagerank_converged,
        )

        empty = rd.from_pandas(
            pd.DataFrame({"url": pd.Series([], dtype=str),
                          "href": pd.Series([], dtype=str)})
        )
        out = host_pagerank_converged(empty)
        assert out.schema().names == ["host", "pagerank", "n_iters"]
        assert out.count() == 0


class TestNbClassifier:
    def _corpus(self):
        import ray.data as rd

        rows = []
        for i in range(8):
            rows.append({"doc_id": i, "text": "alpha beta gamma delta",
                         "label": "pos"})
        for i in range(8, 16):
            rows.append({"doc_id": i, "text": "omega sigma theta kappa",
                         "label": "neg"})
        # mixed doc: half positive vocabulary
        rows.append({"doc_id": 16, "text": "alpha beta theta kappa",
                     "label": "neg"})
        return rd.from_items(rows)

    def test_separates_classes_and_orders_mixed_doc(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            nb_classifier_scores,
        )

        out = nb_classifier_scores(
            self._corpus(),
            positive_filter=lambda b: (b["label"] == "pos").to_numpy(),
            filter_cols=["label"],
        ).to_pandas().set_index("doc_id")
        assert out.loc[0, "mean_llr"] > 0      # pure positive vocab
        assert out.loc[8, "mean_llr"] < 0      # pure negative vocab
        # mixed doc sits strictly between the two pure classes
        assert out.loc[8, "mean_llr"] < out.loc[16, "mean_llr"] < out.loc[0, "mean_llr"]
        assert (out["n_words"] == 4).all()

    def test_identity_under_partitioning(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            nb_classifier_scores,
        )

        kw = dict(
            positive_filter=lambda b: (b["label"] == "pos").to_numpy(),
            filter_cols=["label"],
        )
        a = nb_classifier_scores(self._corpus(), **kw).to_pandas()
        b = nb_classifier_scores(
            self._corpus().repartition(5), **kw
        ).to_pandas()
        key = lambda d: d.sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(key(a), key(b))

    def test_string_id_dtype_preserved(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            nb_classifier_scores,
        )

        ds = rd.from_items(
            [{"url": "https://a.ex/1", "text": "alpha beta", "label": "pos"},
             {"url": "https://b.ex/1", "text": "omega sigma", "label": "neg"}]
        )
        out = nb_classifier_scores(
            ds,
            positive_filter=lambda b: (b["label"] == "pos").to_numpy(),
            id_col="url",
            filter_cols=["label"],
        ).to_pandas()
        assert set(out["url"]) == {"https://a.ex/1", "https://b.ex/1"}
        assert out["url"].dtype == object


class TestUnigramNll:
    def test_rare_word_scores_higher(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            unigram_nll_scores,
        )

        common = "the quick brown fox " * 25
        rows = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    (common + "the quick").strip(),
                    (common + "zyzzyva quux").strip(),
                ],
            }
        )
        out = _pdf(unigram_nll_scores(rd.from_pandas(rows))).set_index(
            "doc_id"
        )
        assert out.loc[2, "mean_nll"] > out.loc[1, "mean_nll"]
        assert (out["nll_micro"] > 0).all()

    def test_identity_under_partitioning(self, ray_session, sf_small):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            unigram_nll_scores,
        )

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        a = _pdf(unigram_nll_scores(docs)).sort_values(
            "doc_id", ignore_index=True
        )
        b = _pdf(unigram_nll_scores(docs.repartition(11))).sort_values(
            "doc_id", ignore_index=True
        )
        pd.testing.assert_frame_equal(a, b)


def test_bm25_matches_bruteforce(ray_session):
    """Randomized differential check against a naive single-process
    BM25 (independent of the SQL oracle): tiny vocab so df/tf vary."""
    import math

    import numpy as np
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import bm25_search

    rng = np.random.default_rng(11)
    vocab = np.array(list("abcde"))
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 25)))
        for _ in range(80)
    ]
    queries = {1: ["a"], 2: ["b", "c"], 3: ["d", "e", "a"]}
    k = 7

    n = len(texts)
    dls = [len(t.split(" ")) for t in texts]
    avgdl = sum(dls) / n
    df = {
        w: sum(1 for t in texts if w in t.split(" "))
        for w in "abcde"
    }
    expected = {}
    for qid, terms in queries.items():
        scores = []
        for d, t in enumerate(texts):
            ws = t.split(" ")
            s = 0
            for w in terms:
                tf = ws.count(w)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
                s += math.floor(
                    idf * (tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * (dls[d] / avgdl)))
                    * 1000000.0 + 0.5
                )
            if s > 0:
                scores.append((s, d))
        scores.sort(key=lambda x: (-x[0], x[1]))
        expected[qid] = [
            (d, s, r + 1) for r, (s, d) in enumerate(scores[:k])
        ]

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(n), "text": texts})
    ).repartition(6)
    out = bm25_search(ds, queries, k=k).to_pandas()
    got = {
        qid: [
            (r.doc_id, r.score, r.rank)
            for r in g.sort_values("rank").itertuples()
        ]
        for qid, g in out.groupby("query_id")
    }
    assert got == expected


def test_latest_by_key_matches_bruteforce(ray_session):
    import numpy as np
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.relational import latest_by_key

    rng = np.random.default_rng(3)
    n = 300
    keys = rng.integers(0, 40, size=n)
    ts = rng.permutation(n)  # unique timestamps, random order
    df = pd.DataFrame(
        {"k": [f"u{x}" for x in keys], "ts": ts, "v": np.arange(n)}
    )
    expected = (
        df.sort_values(["k", "ts"], ascending=[True, False])
        .drop_duplicates("k")
        .sort_values("k", ignore_index=True)
    )
    out = (
        latest_by_key(rd.from_pandas(df).repartition(9), "k", "ts")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "ts", "v"]], expected[["k", "ts", "v"]]
    )


class TestContainmentPairs:
    def test_directional_semantics(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.dedup import containment_pairs

        body = " ".join(f"w{i}" for i in range(60))
        quote = " ".join(f"w{i}" for i in range(20)) + " unique_noise"
        other = " ".join(f"x{i}" for i in range(40))
        ds = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "text": [body, quote, other]}
            )
        )
        out = containment_pairs(
            ds, threshold_num=4, threshold_den=5, on_truncate="ignore"
        ).to_pandas()
        pairs = set(zip(out["inner_id"], out["outer_id"]))
        # quote contained in body; NOT body in quote (asymmetry)
        assert (2, 1) in pairs
        assert (1, 2) not in pairs
        assert not any(3 in p for p in pairs)
        row = out[(out["inner_id"] == 2) & (out["outer_id"] == 1)].iloc[0]
        # quote: 21 words -> 19 shingles, 18 inside body
        assert (row["n_inner"], row["n_shared"]) == (19, 18)

    def test_matches_bruteforce(self, ray_session):
        import numpy as np
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.dedup import (
            containment_pairs,
            word_shingles,
        )

        rng = np.random.default_rng(5)
        vocab = np.array(list("abcdef"))
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 20)))
            for _ in range(50)
        ]
        num, den = 3, 4
        shs = [set(word_shingles(t)) for t in texts]
        expected = set()
        for i, sa in enumerate(shs):
            for j, sb in enumerate(shs):
                if i == j or not sa:
                    continue
                shared = len(sa & sb)
                if den * shared >= num * len(sa):
                    expected.add((i, j, len(sa), shared))
        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        ).repartition(7)
        out = containment_pairs(
            ds, threshold_num=num, threshold_den=den, on_truncate="ignore"
        ).to_pandas()
        got = set(
            zip(out["inner_id"], out["outer_id"], out["n_inner"],
                out["n_shared"])
        )
        assert got == expected


class TestReciprocalHosts:
    def test_mutual_pairs_only(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import reciprocal_hosts

        rows = pd.DataFrame(
            {
                "url": [
                    "https://a.ex/1", "https://b.ex/1", "https://a.ex/2",
                    "https://c.ex/1", "https://a.ex/3", "https://a.ex/4",
                ],
                "href": [
                    "https://b.ex/x",   # a -> b
                    "https://a.ex/x",   # b -> a  (mutual with above)
                    "https://b.ex/y",   # a -> b again (cnt_ab = 2)
                    "https://a.ex/x",   # c -> a  (one-way)
                    "https://a.ex/self",  # same host: excluded
                    "relative/path",    # unparseable host: excluded
                ],
            }
        )
        out = reciprocal_hosts(rd.from_pandas(rows).repartition(3)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["host_a"], r["host_b"]) == ("a.ex", "b.ex")
        assert (r["cnt_ab"], r["cnt_ba"]) == (2, 1)

    def test_empty_when_one_way(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import reciprocal_hosts

        rows = pd.DataFrame(
            {"url": ["https://a.ex/1"], "href": ["https://b.ex/x"]}
        )
        ds = reciprocal_hosts(rd.from_pandas(rows))
        # Dataset-level schema survives the all-empty result (typed
        # empty union) — Ray's to_pandas drops columns on empty data,
        # so the contract check is the schema, not the DataFrame
        assert ds.schema().names == ["host_a", "host_b", "cnt_ab", "cnt_ba"]
        assert ds.count() == 0


def test_unigram_nll_keep_cols(ray_session, sf_small):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.text_analysis import unigram_nll_scores

    docs = rd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    out = unigram_nll_scores(docs, keep_cols=["source"]).to_pandas()
    base = unigram_nll_scores(docs).to_pandas()
    assert "source" in out.columns
    merged = out.merge(base, on="doc_id", suffixes=("", "_base"))
    assert (merged["nll_micro"] == merged["nll_micro_base"]).all()


class TestKeywordSearchIndexed:
    def test_indexed_equals_scan_path(self, ray_session, sf_small, tmp_path):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            build_term_index,
            keyword_search,
            keyword_search_indexed,
        )

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        idx = str(tmp_path / "term_index")
        build_term_index(docs, idx, n_buckets=16)
        q = {1: ["sort", "merge"], 2: ["window"]}
        a = (
            keyword_search(docs, q, k=10)
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        b = (
            keyword_search_indexed(idx, q, k=10, n_buckets=16)
            .to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_partition_pruning_reads_fewer_files(
        self, ray_session, sf_small, tmp_path
    ):
        import ray.data as rd
        from ray.data.datasource.partitioning import PathPartitionFilter

        from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64
        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            build_term_index,
        )

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        idx = str(tmp_path / "term_index")
        build_term_index(docs, idx, n_buckets=16)
        probed = {str(md5_u64("window") % 16)}
        pf = PathPartitionFilter.of(
            lambda kv: kv.get("bucket") in probed, style="hive"
        )
        pruned_files = rd.read_parquet(idx, partition_filter=pf).input_files()
        all_files = rd.read_parquet(idx).input_files()
        assert 0 < len(pruned_files) < len(all_files)


class TestPerplexityBuckets:
    def test_tertiles_and_ordering(self, ray_session, sf_small):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            perplexity_buckets,
            unigram_nll_scores,
        )

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        scored = (
            unigram_nll_scores(docs)
            .select_columns(["doc_id", "mean_nll"])
            .materialize()
        )
        out = _pdf(perplexity_buckets(scored))
        counts = out["bucket"].value_counts()
        n = len(out)
        # tertiles are approximately balanced (histogram granularity)
        for b in ("head", "middle", "tail"):
            assert abs(counts[b] - n / 3) < n * 0.1, counts
        # ordering: every head score <= every tail score
        assert (
            out[out["bucket"] == "head"]["mean_nll"].max()
            <= out[out["bucket"] == "tail"]["mean_nll"].min()
        )

    def test_degenerate_all_equal(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            perplexity_buckets,
        )

        scored = rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2, 3], "mean_nll": [5.0, 5.0, 5.0]})
        )
        out = _pdf(perplexity_buckets(scored))
        assert (out["bucket"] == "head").all()

    def test_identity_under_partitioning(self, ray_session, sf_small):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            perplexity_buckets,
            unigram_nll_scores,
        )

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        scored = (
            unigram_nll_scores(docs)
            .select_columns(["doc_id", "mean_nll"])
            .materialize()
        )
        a = _pdf(perplexity_buckets(scored)).sort_values(
            "doc_id", ignore_index=True
        )
        b = _pdf(perplexity_buckets(scored.repartition(9))).sort_values(
            "doc_id", ignore_index=True
        )
        pd.testing.assert_frame_equal(a, b)


class TestWinnowing:
    def test_matches_bruteforce(self, ray_session):
        import numpy as np
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.dedup import md5_u64, word_shingles
        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            winnow_fingerprints,
        )

        rng = np.random.default_rng(9)
        vocab = np.array(list("abcdefgh"))
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 40)))
            for _ in range(40)
        ]
        w = 4
        expected = set()
        for d, t in enumerate(texts):
            sh = word_shingles(t)
            if len(sh) < w:
                continue
            h = [md5_u64(s) for s in sh]
            for p in range(w - 1, len(sh)):
                window = h[p - w + 1: p + 1]
                mn = min(window)
                # rightmost min
                sel = max(
                    i for i in range(p - w + 1, p + 1) if h[i] == mn
                )
                expected.add((d, sel, h[sel]))
        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        ).repartition(5)
        out = winnow_fingerprints(ds, w=w).to_pandas()
        got = set(
            zip(out["doc_id"], out["pos"], out["gram_hash"].astype(object))
        )
        assert got == {(d, p, h) for d, p, h in expected}

    def test_shared_run_guarantee(self, ray_session):
        """Winnowing's core property: two docs sharing a run of
        >= w+2 words share at least one fingerprint HASH."""
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            winnow_fingerprints,
        )

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
        t1 = "x1 x2 x3 " + shared + " y1 y2"
        t2 = "z9 " + shared + " q5 q6 q7"
        out = winnow_fingerprints(
            rd.from_pandas(
                pd.DataFrame({"doc_id": [1, 2], "text": [t1, t2]})
            ),
            w=4,
        ).to_pandas()
        h1 = set(out[out["doc_id"] == 1]["gram_hash"])
        h2 = set(out[out["doc_id"] == 2]["gram_hash"])
        assert h1 & h2

    def test_short_docs_yield_nothing(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            winnow_fingerprints,
        )

        out = winnow_fingerprints(
            rd.from_pandas(
                pd.DataFrame({"doc_id": [1], "text": ["a b c d e"]})
            ),
            w=4,
        ).to_pandas()
        # 5 words -> 3 shingles < w=4 windows -> no fingerprints
        assert len(out) == 0


class TestCharEntropy:
    def test_known_values(self, ray_session):
        import math

        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            char_entropy_scores,
        )

        rows = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["aaaa", "abab", "abcd"],
            }
        )
        out = _pdf(char_entropy_scores(rd.from_pandas(rows))).set_index(
            "doc_id"
        )
        assert abs(out.loc[1, "entropy"] - 0.0) < 1e-6  # one symbol
        assert abs(out.loc[2, "entropy"] - 1.0) < 1e-6  # two equal
        assert abs(out.loc[3, "entropy"] - 2.0) < 1e-6  # four equal
        assert out.loc[1, "n_chars"] == 4
        # gibberish (uniform random alphabet) scores higher than
        # repeated filler
        assert out.loc[3, "entropy"] > out.loc[1, "entropy"]

    def test_unicode_codepoints(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            char_entropy_scores,
        )

        out = _pdf(
            char_entropy_scores(
                rd.from_pandas(
                    pd.DataFrame({"doc_id": [1], "text": ["héllo"]})
                )
            )
        )
        assert out.iloc[0]["n_chars"] == 5  # codepoints, not bytes


class TestIncrementalNearDups:
    def test_cross_corpus_semantics(self, ray_session, tmp_path):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.dedup import (
            build_minhash_index,
            near_dups_against_index,
        )

        base = " ".join(f"w{i}" for i in range(60))
        day0 = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2],
                    "text": [base, " ".join(f"x{i}" for i in range(50))],
                }
            )
        )
        idx = str(tmp_path / "mh_index")
        build_minhash_index(day0, idx)

        # day N: one near-dup of doc 1 (one word changed), one novel
        near = base.replace("w30", "zz30")
        day_n = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [10, 11],
                    "text": [near, " ".join(f"y{i}" for i in range(40))],
                }
            )
        )
        out = near_dups_against_index(
            day_n, idx, threshold=0.8, on_truncate="ignore"
        ).to_pandas()
        assert set(zip(out["id_a"], out["id_b"])) == {(1, 10)}
        assert (out["jaccard"] >= 0.8).all()

    def test_index_reused_across_batches(self, ray_session, tmp_path):
        """Day-0 signatures are computed once: a second day-N batch
        dedupes against the SAME index directory untouched."""
        import os

        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.dedup import (
            build_minhash_index,
            near_dups_against_index,
        )

        base = " ".join(f"q{i}" for i in range(50))
        idx = str(tmp_path / "mh_index2")
        build_minhash_index(
            rd.from_pandas(pd.DataFrame({"doc_id": [7], "text": [base]})),
            idx,
        )
        mtimes = {
            p: os.path.getmtime(os.path.join(r, p))
            for r, _d, fs in os.walk(idx) for p in fs
        }
        for bid in (100, 200):
            out = near_dups_against_index(
                rd.from_pandas(
                    pd.DataFrame({"doc_id": [bid], "text": [base + " tail"]})
                ),
                idx,
                threshold=0.8,
                on_truncate="ignore",
            ).to_pandas()
            assert set(out["id_b"]) == {bid}
        after = {
            p: os.path.getmtime(os.path.join(r, p))
            for r, _d, fs in os.walk(idx) for p in fs
        }
        assert after == mtimes  # index untouched by queries


class TestIdDtypePreservation:
    """String ids (urls) flow through the rankers unchanged — ADVICE
    round-4 items: unigram_nll_scores must not coerce ids to int64,
    and bm25_search's empty-corpus early return must mirror the
    non-empty path's id dtype."""

    def test_unigram_nll_string_ids(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            unigram_nll_scores,
        )

        docs = pd.DataFrame(
            {
                "url": ["https://a.ex/1", "https://b.ex/2", "https://a.ex/3"],
                "text": ["the cat sat", "the dog ran far", "cat dog"],
            }
        )
        out = unigram_nll_scores(rd.from_pandas(docs), id_col="url").to_pandas()
        assert set(out["url"]) == set(docs["url"])
        int_ids = docs.assign(url=[1, 2, 3])
        twin = unigram_nll_scores(
            rd.from_pandas(int_ids), id_col="url"
        ).to_pandas()
        assert sorted(out["nll_micro"]) == sorted(twin["nll_micro"])

    def test_bm25_empty_corpus_string_id_schema(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import bm25_search

        empty = pd.DataFrame(
            {"url": pd.Series([], dtype="object"),
             "text": pd.Series([], dtype="object")}
        )
        out = bm25_search(rd.from_pandas(empty), {1: ["cat"]}, k=5, id_col="url")
        # Ray's to_pandas drops columns on all-empty data, so the
        # contract check is the Dataset schema (same caveat as the
        # reciprocal_hosts empty test)
        assert sorted(out.schema().names) == ["query_id", "rank", "score", "url"]
        typ = dict(zip(out.schema().names, out.schema().types))["url"]
        assert typ is object or str(typ) in ("string", "large_string", "object")
        assert out.count() == 0


def test_char_entropy_empty_doc_matches_sql(ray_session, tmp_path):
    """Empty text → (0, 0, 0.0) on BOTH sides (engine and the DuckDB
    mirror's UNION ALL edge branch) — the latent divergence from
    round-4 ADVICE."""
    import duckdb
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.corpus import sqlmirror as sm
    from vlm_ocr_doc_reader_ray.stages.text_analysis import char_entropy_scores

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["aab", "", "zz zz"]}
    )
    eng = (
        char_entropy_scores(rd.from_pandas(docs))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pq = str(tmp_path / "documents.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pqt

    pqt.write_table(pa.Table.from_pandas(docs), pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    orc = con.sql(sm.CHAR_ENTROPY_SQL).df().sort_values(
        "doc_id", ignore_index=True
    )
    assert len(eng) == len(orc) == 3
    assert (eng["n_chars"] == orc["n_chars"]).all()
    assert (eng["ent_sum_micro"] == orc["ent_sum_micro"]).all()
    assert (eng["entropy"] - orc["entropy"]).abs().max() < 1e-12
    empty_row = eng[eng["doc_id"] == 2].iloc[0]
    assert (empty_row["n_chars"], empty_row["ent_sum_micro"]) == (0, 0)
    assert empty_row["entropy"] == 0.0


class TestTfidfSearch:
    def test_exact_bag_match_ranks_first(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import tfidf_search

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "apple banana",          # exact bag of query 1
                    "apple cherry cherry",   # partial overlap
                    "banana banana durian",  # partial overlap
                    "elderberry fig",        # no overlap -> excluded
                ],
            }
        )
        out = (
            tfidf_search(rd.from_pandas(df).repartition(2),
                         {1: ["apple", "banana"]}, k=10)
            .to_pandas()
        )
        assert list(out.query_id.unique()) == [1]
        # doc 3 shares no bucket: zero dot, excluded
        assert 3 not in set(out.doc_id)
        # the doc whose bag IS the query ranks 1 with cosine ~1.0
        # (sqrt(x)*sqrt(x) != x in IEEE doubles, so not exactly 1.0 —
        # the SQL mirror lands on the identical 0.999... double)
        top = out[out["rank"] == 1].iloc[0]
        assert top.doc_id == 0
        assert abs(top.cosine - 1.0) < 1e-12
        assert len(out) == 3

    def test_partition_invariance_and_string_ids(self, ray_session, sf_small):
        import pandas as pd
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import tfidf_search

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        qs = {1: ["sort", "merge"], 2: ["customer"]}
        a = tfidf_search(docs, qs, k=5).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        b = tfidf_search(docs.repartition(7), qs, k=5).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        pd.testing.assert_frame_equal(a, b)
        # string ids flow through unchanged (dtype-preserving contract)
        import pyarrow.compute as pc

        def as_str(batch):
            return batch.set_column(
                batch.schema.get_field_index("doc_id"), "doc_id",
                pc.cast(batch.column("doc_id"), "string"),
            )

        c = tfidf_search(
            docs.map_batches(as_str, batch_format="pyarrow"), qs, k=5
        ).to_pandas()
        assert c.doc_id.map(type).eq(str).all()
        assert sorted(c.doc_id.astype(int)) == sorted(a.doc_id)

    def test_indexed_equals_scan(self, ray_session, sf_small, tmp_path):
        import pandas as pd
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import (
            build_tfidf_index,
            tfidf_search,
            tfidf_search_indexed,
        )

        docs = rd.read_parquet(
            f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
        )
        qs = {1: ["sort", "merge", "join"], 2: ["customer", "order"]}
        scan = tfidf_search(docs, qs, k=7).to_pandas().sort_values(
            ["query_id", "rank"], ignore_index=True
        )
        idx = str(tmp_path / "tfidf_idx")
        build_tfidf_index(docs, idx, n_buckets=4096, part_buckets=16)
        indexed = (
            tfidf_search_indexed(idx, qs, k=7, part_buckets=16)
            .to_pandas().sort_values(["query_id", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(scan, indexed)
