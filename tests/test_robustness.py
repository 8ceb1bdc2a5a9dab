"""Robustness: wide rows, empty/hostile payloads, unicode — the
failure-is-data contract under a running pipeline."""

import pyarrow as pa

from vlm_ocr_doc_reader_ray.extract import extract_document
from vlm_ocr_doc_reader_ray.extract.html_extractor import extract_html

LONG_WORDS = " ".join(f"word{i}" for i in range(30))


def test_multi_megabyte_row_single_process():
    body = "".join(f"<p>{LONG_WORDS} chunk {i}</p>" for i in range(20_000))
    payload = f"<html><body>{body}</body></html>".encode()
    assert len(payload) > 4_000_000
    r = extract_document(payload)
    assert r.parse_status == "ok"
    assert r.n_blocks_kept == 20_000
    assert r.spans[-1][1] == len(r.text)


def test_unicode_content_roundtrip():
    para = "čeština příliš žluťoučký kůň úpěl ďábelské ódy " * 3
    payload = f"<html><body><p>{para.strip()}</p></body></html>".encode("utf-8")
    r = extract_html(payload)
    assert r.text == " ".join(para.split())


def test_hostile_payloads_never_raise():
    cases = [
        b"",
        b"\x00" * 64,
        b"<" * 10_000,
        b"%SPDF1\n" + b"{" * 1000,
        ("<p>" * 5_000).encode(),
        b"&" * 10_000,
        "<p>" .encode() + "   nested & entities &amp;&bogus; text here ok yes sure fine".encode(),
    ]
    for payload in cases:
        r = extract_document(payload)
        assert r.parse_status in ("ok", "empty", "failed")


def test_wide_rows_through_pipeline(ray_session):
    """A batch mixing a 4MB doc with normal docs streams through the
    Ray stage (small batch sizes keep batch × concurrency bounded)."""
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.config import EngineConfig
    from vlm_ocr_doc_reader_ray.pipelines.extraction import extract

    big_body = "".join(f"<p>{LONG_WORDS} chunk {i}</p>" for i in range(15_000))
    rows = [
        {"url": "https://big.example.com/0",
         "html": f"<html><body>{big_body}</body></html>".encode(),
         "lang": "en"},
    ] + [
        {"url": f"https://small.example.com/{i}",
         "html": f"<html><body><p>{LONG_WORDS} number {i}</p></body></html>".encode(),
         "lang": "en"}
        for i in range(50)
    ]
    ds = rd.from_items(rows)
    cfg = EngineConfig(extract_batch_size=8)
    out = extract(ds, cfg=cfg, emit_spans=False, emit_registry=False).to_pandas()
    assert len(out) == 51
    assert (out["parse_status"] == "ok").all()
    big = out[out["url"] == "https://big.example.com/0"].iloc[0]
    assert big["n_blocks_kept"] == 15_000


def test_new_ops_empty_input_no_crash(ray_session):
    """Ray groupby/aggregate on an EMPTY dataset loses schema (known
    trap); every round-3 operator must degrade to an empty result,
    never a KeyError/TypeError."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        approx_quantiles,
        exact_quantiles,
        grouped_exact_quantiles,
    )
    from vlm_ocr_doc_reader_ray.stages.relational import global_sorted_rank
    from vlm_ocr_doc_reader_ray.stages.sketch import heavy_hitters
    from vlm_ocr_doc_reader_ray.stages.text_analysis import (
        mixture_rebalance,
        pack_sequences,
        term_postings,
        token_budget_head,
    )

    empty = rd.from_pandas(
        pd.DataFrame({"k": pd.Series([], dtype="object"),
                      "v": pd.Series([], dtype="int64"),
                      "g": pd.Series([], dtype="object")})
    )

    def rows(out):
        return len(out.to_pandas() if hasattr(out, "to_pandas") else out)

    assert rows(exact_quantiles(empty, "v", [0.5])) == 0
    assert rows(grouped_exact_quantiles(empty, "g", "v", [0.5])) == 0
    assert rows(approx_quantiles(empty, "v", [0.5])) == 0
    assert rows(global_sorted_rank(empty, "k")) == 0
    assert rows(pack_sequences(empty, "k", "v", 64)) == 0
    assert rows(token_budget_head(empty, "k", "v", 100)) == 0
    assert rows(mixture_rebalance(empty, "k", "g", {"a": 2.0})) == 0
    assert rows(heavy_hitters(empty.select_columns(["k"]), "k", 5)) == 0
    assert rows(
        term_postings(empty.rename_columns({"k": "text", "g": "doc_id"}), min_df=1)
    ) == 0

    import tempfile

    from vlm_ocr_doc_reader_ray.pipelines.shards import write_training_shards

    with tempfile.TemporaryDirectory() as d:
        m = write_training_shards(empty, "k", d, 10)
        assert len(m) == 0 and list(m.columns) == ["shard", "rows", "path", "skipped"]

    from vlm_ocr_doc_reader_ray.stages.scrub import blocklist_filter
    from vlm_ocr_doc_reader_ray.stages.text_analysis import word_freq_score

    wf = empty.rename_columns({"k": "text", "g": "doc_id"})
    assert rows(word_freq_score(wf)) == 0
    assert rows(blocklist_filter(empty, "g", {"x"})) == 0


def test_new_analytics_empty_input_no_crash(ray_session):
    """Every late-round-4 operator must tolerate a zero-row input:
    Ray loses groupby schema on empty datasets (engine-wide known
    trap), so the contract here is 'no crash, zero rows' — pinned
    after grouped_percentile_rank was found to KeyError on the
    schema-less empty histogram."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.aggregates import (
        grouped_percentile_rank,
        grouped_quantile_gate,
        grouped_zscore,
    )
    from vlm_ocr_doc_reader_ray.stages.relational import (
        cohort_retention,
        event_transition_counts,
        funnel_counts,
        windowed_distinct_users,
    )
    from vlm_ocr_doc_reader_ray.stages.text_analysis import top_terms_per_group

    empty_ev = rd.from_pandas(pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64"),
         "ts": pd.Series([], dtype="datetime64[us]"),
         "event_type": pd.Series([], dtype="object"),
         "event_id": pd.Series([], dtype="int64")}))
    empty_docs = rd.from_pandas(pd.DataFrame(
        {"g": pd.Series([], dtype="object"),
         "v": pd.Series([], dtype="float64"),
         "lang": pd.Series([], dtype="object"),
         "text": pd.Series([], dtype="object")}))

    outs = [
        funnel_counts(empty_ev, ["signup", "purchase"]),
        cohort_retention(empty_ev),
        event_transition_counts(empty_ev),
        windowed_distinct_users(empty_ev),
        top_terms_per_group(empty_docs, "lang"),
        grouped_quantile_gate(empty_docs, "g", "v"),
        grouped_percentile_rank(empty_docs, "g", "v"),
        grouped_zscore(empty_docs, "g", "v"),
    ]
    for o in outs:
        assert len(o.to_pandas()) == 0


def test_round5_ops_empty_input_no_crash(ray_session):
    """Round-5 operators degrade to empty/zero results on an empty
    corpus — never a KeyError/ZeroDivision (the empty-groupby schema
    trap)."""
    import pandas as pd
    import ray.data as rd

    from vlm_ocr_doc_reader_ray.stages.bpe import (
        bpe_fertility_by_group,
        fixed_merges,
    )
    from vlm_ocr_doc_reader_ray.stages.scrub import gopher_signals
    from vlm_ocr_doc_reader_ray.stages.text_analysis import tfidf_search

    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object"),
                      "source": pd.Series([], dtype="object")})
    )

    def rows(out):
        return len(out.to_pandas() if hasattr(out, "to_pandas") else out)

    assert rows(gopher_signals(empty)) == 0
    assert rows(bpe_fertility_by_group(empty, fixed_merges())) == 0
    assert rows(tfidf_search(empty, {1: ["sort"]}, k=5)) == 0
