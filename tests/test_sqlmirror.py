"""SQL mirror == Python golden on real data (no Ray).

If these pass, the driver's DuckDB oracle gate and our goldens agree.
"""

import hashlib

import duckdb
import pytest

from vlm_ocr_doc_reader_ray.corpus import sqlmirror as sm
from vlm_ocr_doc_reader_ray.corpus.generator import entity_values, golden, url_of


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    return c


def test_extract_text_sql_matches_golden(con, small_documents):
    rows = {r[0]: r for r in con.sql(sm.EXTRACT_TEXT_SQL).fetchall()}
    assert len(rows) == len(small_documents)
    for doc_id, text, lang, source in small_documents:
        g = golden(doc_id, text, lang, source)
        url = url_of(doc_id, lang, source)
        _u, _lang, ext, sha, nkept, status, pages = rows[url]
        assert ext == g.extracted_text
        assert sha == hashlib.sha256(g.extracted_text.encode()).hexdigest()
        assert nkept == g.n_blocks_kept
        assert pages == g.page_count
        assert status == ("failed" if g.is_corrupt else "ok")


def test_registry_sql_matches_golden(con, small_documents):
    rows = con.sql(sm.REGISTRY_SQL).fetchall()
    by_url: dict = {}
    for url, page, kind, value, res, ver, conf, status in rows:
        by_url.setdefault(url, {})[kind] = (value, page, res, ver, conf, status)
    for doc_id, text, lang, source in small_documents:
        g = golden(doc_id, text, lang, source)
        url = url_of(doc_id, lang, source)
        if g.is_corrupt:
            assert url not in by_url
            continue
        ev = entity_values(doc_id, source)
        got = by_url[url]
        assert set(got) == set(ev)
        for kind, value in ev.items():
            assert got[kind] == (value, g.page_count, 2, True, "3/3", "ok")


def test_page_states_sql_row_counts(con, small_documents):
    rows = con.sql(sm.PAGE_STATES_SQL).fetchall()
    expected = 0
    for doc_id, text, lang, source in small_documents:
        g = golden(doc_id, text, lang, source)
        expected += 1 if g.is_corrupt else g.page_count
    assert len(rows) == expected


def test_host_stats_sql_consistency(con, small_documents):
    rows = con.sql(sm.HOST_STATS_SQL).fetchall()
    assert sum(r[1] for r in rows) == len(small_documents)
    hosts = {r[0] for r in rows}
    assert all(h.endswith(".example.com") for h in hosts)


def test_text_analysis_lockstep_on_hostile_text():
    """Multi-space, newline, tab, accented and empty texts must agree
    between TextAnalyzer and the DuckDB mirror (the guard for the
    split(' ') + ASCII-regex lockstep contract)."""
    import pandas as pd
    import pyarrow as pa

    from vlm_ocr_doc_reader_ray.stages.text_analysis import TextAnalyzer

    texts = [
        "the  quick   brown fox",          # multi-space
        "line one\nline two\tand three",   # newline + tab
        "café naïve résumé 你好",  # non-ASCII
        "",                                 # empty
        " leading and trailing ",
        "the and of a to is are was",
    ]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        TextAnalyzer()(pa.table(docs))
        .to_pandas()[
            ["doc_id", "lang_pred", "n_words", "n_chars_measured",
             "stopword_ratio", "n_punct", "ws_tokens", "bpe_tokens", "fingerprint"]
        ]
        .sort_values("doc_id", ignore_index=True)
    )
    c = duckdb.connect()
    c.register("documents", docs)
    want = c.sql(sm.TEXT_ANALYSIS_SQL).df().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
