"""Corpus-hygiene operators (stages/scrub.py): PII masking order,
repetition fixed-point, n-gram census determinism, and the C4-style
line-dedup contract — all pinned on hand-built inputs plus
partitioning invariance."""

from __future__ import annotations

import pandas as pd
import pytest

from vlm_ocr_doc_reader_ray.stages.scrub import (
    line_dedup,
    ngram_counts,
    pii_scrub,
    repetition_stats,
)


def _ds(df, nblocks=1):
    import ray.data as rd

    ds = rd.from_pandas(df)
    return ds.repartition(nblocks) if nblocks > 1 else ds


def test_pii_scrub_masks_emails_then_ips(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail a@b.com and c.d@e.org end",
                "ip 10.0.0.1 twice 255.255.255.255",
                # the email is masked FIRST, so the dotted quad inside
                # it never survives to the IP pass
                "tricky 1.2.3.4@host.com here",
                "clean text no pii",
            ],
        }
    )
    out = (
        pii_scrub(_ds(df)).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert list(out.n_emails) == [2, 0, 1, 0]
    assert list(out.n_ips) == [0, 2, 0, 0]
    assert out.scrubbed[0] == "mail <EMAIL> and <EMAIL> end"
    assert out.scrubbed[1] == "ip <IP> twice <IP>"
    assert out.scrubbed[2] == "tricky <EMAIL> here"
    assert out.scrubbed[3] == "clean text no pii"


def test_repetition_stats_short_and_repeated(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "ab",  # < 3 words: 1 gram, 0 dup, pass
                "x y z x y z x y z x y",  # heavy 3-gram repetition
                "a b c d e f",  # all distinct
            ],
        }
    )
    out = (
        repetition_stats(_ds(df), max_dup_fraction=0.3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out.n_ngrams) == [1, 9, 4]
    assert list(out.n_distinct) == [1, 3, 4]
    # (9-3)/9 = 0.666667 → round-half-up fixed point
    assert list(out.dup_ppm) == [0, 666667, 0]
    assert list(out.repetition_pass) == [True, False, True]


def test_ngram_counts_total_order_and_partition_invariance(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "a b a b a b",  # "a b"×3, "b a"×2
                "b a",  # "b a"×1 → ties "a b"? no: b a = 3 total
                "c d",
                "x",  # single word: no bigrams
            ],
        }
    )
    one = ngram_counts(_ds(df), n=2, top_k=3).to_pandas()
    # total order: count desc, ngram asc
    assert list(one.ngram) == ["a b", "b a", "c d"]
    assert list(one.n) == [3, 3, 1]
    many = (
        ngram_counts(_ds(df, nblocks=4), n=2, top_k=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_line_dedup_first_occurrence_wins_and_reassembles(ray_session):
    # 2-word lines for a readable fixture
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c d",  # lines: "a b", "c d"
                "c d e f",  # "c d" lost to doc 0, keeps "e f"
                "a b c d",  # exact dup of doc 0: loses everything
            ],
        }
    )
    out = (
        line_dedup(_ds(df), words_per_line=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out.doc_id) == [0, 1]  # doc 2 vanished entirely
    assert list(out.text) == ["a b c d", "e f"]
    assert list(out.n_lines_kept) == [2, 1]


def test_line_dedup_partition_invariance(ray_session, sf_small):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "text"])
    a = (
        line_dedup(docs)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        line_dedup(docs.repartition(7))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_gopher_signals_hand_computed(ray_session):
    from vlm_ocr_doc_reader_ray.stages.scrub import gopher_signals

    # doc 0: 16 identical words -> two identical 8-word lines.
    t0 = " ".join(["w"] * 16)
    # doc 1: all-distinct words — long enough that the top 2-gram's
    # natural coverage (3/23 chars) sits under the 20% threshold.
    t1 = "a b c d e f g h i j k l"
    # doc 2: single word — no 2-grams, no 5-grams, one line, no dups.
    t2 = "solo"
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": [t0, t1, t2]})
    out = (
        gopher_signals(_ds(df, nblocks=2))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out.n_lines) == [2, 2, 1]
    # doc 0: 1 of 2 lines is a repeat -> 500000 ppm; repeat chars =
    # len('w w w w w w w w')=15 over line_chars 30 -> 500000 ppm.
    assert out.dup_line_ppm[0] == 500000
    assert out.dup_line_char_ppm[0] == 500000
    # top 2-gram 'w w' (len 3) occurs 15 times -> 45 chars over
    # len(t0)=31 -> half-up ppm of 45/31.
    assert out.top_2gram_char_ppm[0] == (45 * 2_000_000 + 31) // 62
    # 5-gram 'w w w w w' (len 9) occurs 12 times, duplicated ->
    # 108 chars over 31 (overlap makes this exceed 1e6 — documented).
    assert out.dup_5gram_char_ppm[0] == (108 * 2_000_000 + 31) // 62
    assert not out.gopher_pass[0]
    # doc 1: no repeats anywhere; top 2-gram is the lexicographically
    # smallest ('a b', len 3, count 1) -> 3 chars over 23.
    assert out.dup_line_ppm[1] == 0
    assert out.dup_line_char_ppm[1] == 0
    assert out.top_2gram_char_ppm[1] == (3 * 2_000_000 + 23) // 46
    assert out.dup_5gram_char_ppm[1] == 0
    assert out.gopher_pass[1]
    # doc 2: degenerate — everything zero, passes.
    assert (
        out.loc[2, ["dup_line_ppm", "dup_line_char_ppm",
                    "top_2gram_char_ppm", "dup_5gram_char_ppm"]] == 0
    ).all()
    assert out.gopher_pass[2]


def test_gopher_signals_partition_invariance(ray_session, sf_small):
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.scrub import gopher_signals

    docs = rd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    )
    a = gopher_signals(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    b = gopher_signals(docs.repartition(7)).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b)


def test_repetition_dup_ppm_rounds_half_up(ray_session):
    # 3 grams, 1 dup → 333333.33 → 333333; 3 grams 2 dup → 666666.67 → 666667
    df = pd.DataFrame({"doc_id": [0], "text": ["p q r p q r p"]})
    # grams: "p q r","q r p","r p q","p q r","q r p" → 5 total 3 distinct
    out = repetition_stats(_ds(df)).to_pandas()
    assert out.n_ngrams[0] == 5 and out.n_distinct[0] == 3
    assert out.dup_ppm[0] == 400000  # 2/5 exactly


def test_contamination_check_hits_and_short_doc_rule(ray_session):
    from vlm_ocr_doc_reader_ray.stages.scrub import (
        contamination_check,
        eval_ngram_set,
    )

    ev = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps over it"]}
    )
    # doc 0 contains an eval trigram twice; doc 1 is clean; doc 2 is
    # shorter than n (no n-grams at all -> clean by construction)
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "x the quick brown y the quick brown z",
                "totally unrelated words here now",
                "too short",
            ],
        }
    )
    evset = eval_ngram_set(_ds(ev), n=3)
    assert "the quick brown" in evset and len(evset) == 5
    out = (
        contamination_check(_ds(df, nblocks=3), evset, n=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out.n_ngrams) == [7, 3, 0]
    assert list(out.n_eval_hits) == [2, 0, 0]
    assert list(out.contaminated) == [True, False, False]


def test_contamination_partition_invariance(ray_session):
    from vlm_ocr_doc_reader_ray.stages.scrub import (
        contamination_check,
        eval_ngram_set,
    )

    rows = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                f"w{i} common tail phrase here padded {'x ' * (i % 4)}end"
                for i in range(40)
            ],
        }
    )
    ev = pd.DataFrame({"doc_id": [9000], "text": ["common tail phrase here we go"]})
    evset = eval_ngram_set(_ds(ev), n=4)
    a = (
        contamination_check(_ds(rows, nblocks=1), evset, n=4)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    b = (
        contamination_check(_ds(rows, nblocks=7), evset, n=4)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a.contaminated.all()


def test_arrow_ngrams_equals_pandas_ngrams():
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.stages.scrub import (
        _batch_word_ngrams,
        arrow_word_ngrams,
    )

    texts = [
        "a b c d", "", "x  y", "solo", "one two", "t",
        "double  space  run", " lead and trail ",
    ]
    for n in (1, 2, 3):
        pg, pdi = _batch_word_ngrams(pd.Series(texts), n)
        ag, adi = arrow_word_ngrams(pa.array(texts), n)
        assert list(pg) == ag.to_pylist()
        assert list(pdi) == list(adi)


def test_normalize_text_unicode_and_ws(ray_session):
    """NFC + whitespace collapse must match DuckDB's
    nfc_normalize/regexp_replace/trim on decomposed unicode, tabs,
    newlines and edge whitespace."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.scrub import normalize_text

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["Café  x", "\t a \n b \r\n", "", "   ", "é́",
                 "plain text"],
    })
    got = (
        normalize_text(rd.from_pandas(df))
        .to_pandas().sort_values("doc_id", ignore_index=True)["text_norm"]
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT trim(regexp_replace(nfc_normalize(text), "
        "'[ ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || ']+',"
        " ' ', 'g')) AS n FROM t ORDER BY doc_id"
    ).df()["n"]
    assert list(got) == list(want)
    assert got[0] == "Café x"


class TestSpanDedup:
    """Duplicated-span removal: interval semantics, the no-dup
    passthrough guard, and partitioning invariance."""

    def _run(self, texts, n=3, nblocks=1):
        from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = span_dedup(_ds(df, nblocks), n=n).to_pandas()
        return out.sort_values("doc_id", ignore_index=True)

    def test_exact_dup_docs_fully_covered(self, ray_session):
        t = "a b c d e f"
        out = self._run([t, t], n=3)
        assert list(out["text"]) == ["", ""]
        assert list(out["n_kept"]) == [0, 0]
        assert list(out["n_dropped"]) == [6, 6]

    def test_partial_overlap_drops_only_shared_span(self, ray_session):
        # docs share the 3-gram "x y z"; surrounding words survive
        out = self._run(["p q x y z r s", "t u x y z v w"], n=3)
        assert list(out["text"]) == ["p q r s", "t u v w"]
        assert list(out["n_dropped"]) == [3, 3]

    def test_within_doc_repeat_counts(self, ray_session):
        # the SAME doc repeating an n-gram twice reaches min_count=2
        out = self._run(["a b c k a b c", "clean words only here"], n=3)
        assert out.loc[0, "text"] == "k"
        assert out.loc[1, "text"] == "clean words only here"

    def test_no_dups_passthrough(self, ray_session):
        texts = ["one two three four", "five six seven eight"]
        out = self._run(texts, n=3)
        assert list(out["text"]) == texts
        assert list(out["n_dropped"]) == [0, 0]
        assert list(out["n_kept"]) == [4, 4]

    def test_short_docs_never_covered(self, ray_session):
        # docs shorter than n contribute no grams even if identical
        out = self._run(["a b", "a b"], n=3)
        assert list(out["text"]) == ["a b", "a b"]

    def test_partitioning_invariance(self, ray_session):
        texts = [f"w{i % 4} x y z tail{i}" for i in range(40)]
        a = self._run(texts, n=3, nblocks=1)
        b = self._run(texts, n=3, nblocks=7)
        pd.testing.assert_frame_equal(a, b)


class TestKeywordSearch:
    def _run(self, texts, queries, k=3, nblocks=1):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import keyword_search

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = keyword_search(_ds(df, nblocks), queries, k=k).to_pandas()
        return out.sort_values(["query_id", "rank"], ignore_index=True)

    def test_scores_and_ranks(self, ray_session):
        out = self._run(
            ["cat cat dog", "cat dog dog dog", "bird"],
            {1: ["cat"], 2: ["dog", "bird"]},
        )
        q1 = out[out.query_id == 1]
        assert list(q1["doc_id"]) == [0, 1]
        assert list(q1["score"]) == [2, 1]
        q2 = out[out.query_id == 2]
        assert list(q2["doc_id"]) == [1, 0, 2]
        assert list(q2["score"]) == [3, 1, 1]
        assert list(q2["rank"]) == [1, 2, 3]

    def test_ties_break_by_doc_id_and_k_caps(self, ray_session):
        out = self._run(["x"] * 5, {7: ["x"]}, k=2, nblocks=3)
        assert list(out["doc_id"]) == [0, 1]
        assert list(out["rank"]) == [1, 2]

    def test_no_hits_empty_with_schema(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import keyword_search
        import ray.data as rd

        df = pd.DataFrame({"doc_id": [0], "text": ["nothing relevant"]})
        ds = keyword_search(rd.from_pandas(df), {1: ["absent"]})
        assert ds.count() == 0


class TestUrlDedup:
    def test_min_id_wins_and_counts(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.urltools import url_dedup

        df = pd.DataFrame(
            {
                "doc_id": [5, 3, 9, 7, 1],
                "url": [
                    "https://A.com:443/x",   # canon https://a.com/x
                    "https://a.com/x",        # same
                    "https://a.com/x#frag",   # same
                    "http://b.org/",          # unique
                    "garbage",                # dropped
                ],
            }
        )
        out = (
            url_dedup(_ds(df, 2))
            .to_pandas()
            .sort_values("url_norm", ignore_index=True)
        )
        assert list(out["url_norm"]) == ["http://b.org/", "https://a.com/x"]
        assert list(out["doc_id"]) == [7, 3]
        assert list(out["n_dupes"]) == [1, 3]


class TestSpanDedupHashed:
    def test_hashed_equals_string_mode(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

        texts = [f"w{i % 4} x y z tail{i}" for i in range(40)] + [
            "a b c d e f", "a b c d e f"
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        a = (
            span_dedup(_ds(df, 5), n=3)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        b = (
            span_dedup(_ds(df, 5), n=3, hashed=True)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_hashed_string_ids(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

        df = pd.DataFrame(
            {
                "url": [f"https://h/{i}" for i in range(4)],
                "text": ["p q x y z r s", "t u x y z v w",
                         "clean doc one", "clean doc two"],
            }
        )
        out = (
            span_dedup(_ds(df, 2), id_col="url", n=3, hashed=True)
            .to_pandas().sort_values("url", ignore_index=True)
        )
        assert list(out["text"]) == [
            "p q r s", "t u v w", "clean doc one", "clean doc two"
        ]


class TestPhraseSearch:
    def test_adjacency_required(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import phrase_search
        import ray.data as rd

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "red fox red fox",      # 2 occurrences of "red fox"
                    "red big fox",          # words present, not adjacent
                    "the red fox runs",     # 1 occurrence
                ],
            }
        )
        out = (
            phrase_search(rd.from_pandas(df).repartition(2), {7: "red fox"}, k=5)
            .to_pandas()
            .sort_values("rank", ignore_index=True)
        )
        assert list(out["doc_id"]) == [0, 2]
        assert list(out["score"]) == [2, 1]
        assert list(out["rank"]) == [1, 2]

    def test_overlapping_occurrences_count(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.text_analysis import phrase_search
        import ray.data as rd

        df = pd.DataFrame({"doc_id": [0], "text": ["a a a a"]})
        out = phrase_search(rd.from_pandas(df), {1: "a a"}, k=5).to_pandas()
        assert list(out["score"]) == [3]  # sliding windows overlap


class TestSourceDupProfile:
    def test_profile_attributes_drops_to_group(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.scrub import source_dup_profile
        import ray.data as rd

        dup = "x y z w v u t s"  # 8 words, shared 8-gram
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [dup, dup, "clean words here now"],
                "source": ["a", "b", "b"],
            }
        )
        out = (
            source_dup_profile(rd.from_pandas(df).repartition(2), n=8)
            .to_pandas()
            .sort_values("source", ignore_index=True)
        )
        got = {
            r.source: (r.n_docs, r.tok_kept, r.tok_dropped)
            for r in out.itertuples()
        }
        assert got == {"a": (1, 0, 8), "b": (2, 4, 8)}


def test_span_dedup_matches_bruteforce(ray_session):
    """Randomized differential check against a naive per-doc reference
    (independent of the SQL oracle): tiny vocab + short grams so
    duplicated spans are dense and overlapping."""
    import numpy as np
    from collections import Counter

    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

    rng = np.random.default_rng(7)
    vocab = np.array(list("abcdefg"))
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(60)
    ]
    n = 4

    cnt: Counter = Counter()
    grams_per_doc = []
    for t in texts:
        ws = t.split(" ")
        gs = [" ".join(ws[i: i + n]) for i in range(len(ws) - n + 1)]
        grams_per_doc.append(gs)
        cnt.update(gs)
    expected = {}
    for d, t in enumerate(texts):
        ws = t.split(" ")
        cov = [False] * len(ws)
        for i, g in enumerate(grams_per_doc[d]):
            if cnt[g] >= 2:
                for j in range(i, i + n):
                    cov[j] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        expected[d] = (" ".join(kept), len(kept), len(ws) - len(kept))

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for hashed in (False, True):
        out = (
            span_dedup(_ds(df, 4), n=n, hashed=hashed)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        got = {
            r.doc_id: (r.text, r.n_kept, r.n_dropped)
            for r in out.itertuples()
        }
        assert got == expected, f"hashed={hashed}"
