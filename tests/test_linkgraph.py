"""Link scanner + link-graph stage + chunk-window math unit tests.

The SQL parity of ``link_graph`` / ``host_link_degree`` /
``collocations`` / ``chunk_windows`` is pinned corpus-wide in
``test_queries_vs_duckdb.py``; these pin the edge cases the synthetic
corpus never produces (nested anchors, RAWTEXT bodies, unclosed
anchors, non-HTML payloads, chunk boundary arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from vlm_ocr_doc_reader_ray.extract.links import extract_links, scan_links


class TestScanLinks:
    def test_document_order_and_chrome(self):
        html = (
            "<html><body><nav><a href='/a'>A</a></nav>"
            "<main><a href='/b'>B <b>bold</b></a></main>"
            "<footer><a href='/c'>C</a></footer></body></html>"
        )
        got = scan_links(html)
        assert got == [("/a", "A", True), ("/b", "B bold", False), ("/c", "C", True)]

    def test_anchor_without_href_skipped(self):
        assert scan_links("<a name='x'>no link</a><a href='/y'>y</a>") == [
            ("/y", "y", False)
        ]

    def test_nested_anchor_closes_previous(self):
        # browser recovery: <a><a> closes the first anchor
        got = scan_links("<a href='/1'>one <a href='/2'>two</a> tail")
        assert got == [("/1", "one", False), ("/2", "two", False)]

    def test_rawtext_body_cannot_fake_tags(self):
        html = "<script>var s='<a href=\"/fake\">x</a>';</script><a href='/real'>r</a>"
        assert scan_links(html) == [("/real", "r", False)]

    def test_skip_tags_drop_inner_text(self):
        got = scan_links("<a href='/x'>keep<svg><desc>drop</desc></svg>ed</a>")
        assert got == [("/x", "keeped", False)]

    def test_entities_unescaped_and_ws_collapsed(self):
        got = scan_links("<a href='/e'>a &amp;\n\t b</a>")
        assert got == [("/e", "a & b", False)]

    def test_unquoted_and_single_quoted_href(self):
        got = scan_links('<a href=/u>u</a><a href="/d">d</a>')
        assert got == [("/u", "u", False), ("/d", "d", False)]

    def test_unclosed_anchor_at_eof(self):
        assert scan_links("<p>x</p><a href='/last'>tail text") == [
            ("/last", "tail text", False)
        ]


class TestExtractLinks:
    def test_resolves_relative_against_page_url(self):
        recs = extract_links(
            b"<a href='/s/1'>one</a><a href='https://other.com/p'>two</a>",
            "https://news.example.com/art/7",
        )
        assert [r["href"] for r in recs] == [
            "https://news.example.com/s/1",
            "https://other.com/p",
        ]
        assert [r["pos"] for r in recs] == [0, 1]

    @pytest.mark.parametrize(
        "payload", [b"", b"%SPDF1\x00junk", b"\xff\xfe broken \x9c"]
    )
    def test_non_html_payloads_yield_no_links(self, payload):
        assert extract_links(payload, "https://h.example.com/") == []


class TestChunkWindows:
    def _run(self, ray_session, texts, window=24, stride=16):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import chunk_windows

        ds = rd.from_arrow(
            pa.table({"doc_id": list(range(len(texts))), "text": texts})
        )
        return (
            chunk_windows(ds, window=window, stride=stride)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"], ignore_index=True)
        )

    def test_matches_naive_reference(self, ray_session):
        rng = np.random.default_rng(7)
        texts = [
            " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(n)))
            for n in rng.integers(1, 90, size=40)
        ]
        df = self._run(ray_session, texts, window=10, stride=4)
        got = list(zip(df.doc_id, df.chunk_id, df.chunk_text, df.n_words))
        want = []
        for d, t in enumerate(texts):
            ws = t.split(" ")
            nw = len(ws)
            nch = 1 if nw <= 10 else 1 + -(-(nw - 10) // 4)
            for i in range(nch):
                seg = ws[i * 4 : min(i * 4 + 10, nw)]
                want.append((d, i, " ".join(seg), len(seg)))
        assert got == want

    def test_short_doc_one_chunk(self, ray_session):
        df = self._run(ray_session, ["a b c"], window=24, stride=16)
        assert len(df) == 1 and df.chunk_text[0] == "a b c" and df.n_words[0] == 3

    def test_exact_window_boundary(self, ray_session):
        # nw == window → exactly 1 chunk; nw == window+1 → 2 chunks
        t24 = " ".join(f"x{i}" for i in range(24))
        t25 = " ".join(f"x{i}" for i in range(25))
        df = self._run(ray_session, [t24, t25])
        assert df[df.doc_id == 0].shape[0] == 1
        d1 = df[df.doc_id == 1]
        assert d1.shape[0] == 2
        assert list(d1.n_words) == [24, 9]  # second chunk: words 16..24

    def test_stride_gt_window_rejected(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.text_analysis import chunk_windows

        with pytest.raises(ValueError):
            chunk_windows(
                rd.from_items([{"doc_id": 0, "text": "a"}]), window=4, stride=8
            )


class TestLinkAnalytics:
    """Frontier / anchor-profile / in-degree over a hand-built link
    table where the expected answer is countable by eye. The
    corpus-wide SQL parity lives in ``test_queries_vs_duckdb.py``."""

    def _links(self):
        import ray.data as rd

        rows = [
            # (page url, href, anchor_text, chrome)
            ("https://a.example.com/p1", "https://b.example.com/x", "go b now", False),
            ("https://a.example.com/p1", "https://b.example.com/y", "go b", True),
            ("https://a.example.com/p2", "https://b.example.com/x", "go b again", False),
            ("https://c.example.com/p9", "https://b.example.com/x", "best b", False),
            ("https://c.example.com/p9", "https://a.example.com/p1", "back", False),
        ]
        return rd.from_items(
            [
                {"url": u, "pos": i, "href": h, "anchor_text": a, "chrome": c}
                for i, (u, h, a, c) in enumerate(rows)
            ]
        )

    def test_frontier_drops_crawled_hrefs(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import frontier_urls

        crawled = rd.from_items(
            [
                {"url": "https://a.example.com/p1"},
                {"url": "https://a.example.com/p2"},
                {"url": "https://c.example.com/p9"},
            ]
        )
        df = (
            frontier_urls(self._links(), crawled)
            .to_pandas()
            .sort_values("href", ignore_index=True)
        )
        # the back-link to the crawled p1 must be dropped; the three
        # b.example.com targets survive with distinct-referrer counts
        assert list(df.href) == [
            "https://b.example.com/x",
            "https://b.example.com/y",
        ]
        assert list(df.n_ref_pages) == [3, 1]

    def test_anchor_top_terms_order(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import anchor_top_terms

        df = (
            anchor_top_terms(self._links(), k=2)
            .to_pandas()
            .sort_values(["target_host", "rank"], ignore_index=True)
        )
        b = df[df.target_host == "b.example.com"]
        # counts over b-anchors: b×4, go×3, again×1, best×1, now×1
        assert list(b.word) == ["b", "go"] and list(b.cnt) == [4, 3]
        a = df[df.target_host == "a.example.com"]
        assert list(a.word) == ["back"] and list(a["rank"]) == [1]

    def test_host_authority_integer_step(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_authority

        df = (
            host_authority(self._links())
            .to_pandas()
            .sort_values("host", ignore_index=True)
        )
        got = {r.host: (r.n_inlinks, r.authority) for r in df.itertuples()}
        # edges: a→b ×3, c→b ×1, c→a ×1; indeg a=1, b=4, c absent(0)
        # authority(b) = 3·indeg(a) + 1·indeg(c) = 3; authority(a) = 1·0
        assert got == {"a.example.com": (1, 0), "b.example.com": (4, 3)}

    def test_empty_links_schema_stable(self, ray_session):
        """A zero-link corpus (all PDF/corrupt) must yield EMPTY
        results with the contract columns — Ray's groupby on an empty
        dataset loses schema, so every op guards behind its residue
        materialize."""
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import (
            anchor_top_terms,
            frontier_schedule,
            frontier_urls,
            host_authority,
            host_inlink_degree,
            host_link_degree,
            page_outdegree_hist,
        )

        empty = rd.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "pos": pa.array([], pa.int64()),
                    "href": pa.array([], pa.string()),
                    "anchor_text": pa.array([], pa.string()),
                    "chrome": pa.array([], pa.bool_()),
                }
            )
        )
        crawled = rd.from_items([{"url": "https://a.example.com/p1"}])
        cases = {
            "host_link_degree": (
                host_link_degree(empty),
                ["host", "n_links", "n_chrome", "n_external",
                 "n_distinct_targets"],
            ),
            "host_inlink_degree": (
                host_inlink_degree(empty),
                ["host", "n_inlinks", "n_src_hosts", "n_ref_pages"],
            ),
            "host_authority": (
                host_authority(empty), ["host", "n_inlinks", "authority"]
            ),
            "frontier_urls": (
                frontier_urls(empty, crawled), ["href", "n_ref_pages"]
            ),
            "frontier_schedule": (
                frontier_schedule(frontier_urls(empty, crawled)),
                ["href", "host", "n_ref_pages", "fetch_round"],
            ),
            "anchor_top_terms": (
                anchor_top_terms(empty),
                ["target_host", "rank", "word", "cnt"],
            ),
            "page_outdegree_hist": (
                page_outdegree_hist(empty, crawled), ["outdeg", "n_pages"]
            ),
        }
        for name, (ds, want_cols) in cases.items():
            # Dataset-level schema is the contract (select_columns /
            # joins consume it); pandas conversion of zero rows drops
            # columns in Ray, so assert on schema() + count()
            got_cols = ds.schema().names
            assert sorted(got_cols) == sorted(want_cols), (name, got_cols)
            # page_outdegree_hist still counts the crawled page (outdeg 0)
            want_rows = 1 if name == "page_outdegree_hist" else 0
            assert ds.count() == want_rows, name

    def test_frontier_schedule_rounds(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import frontier_schedule

        frontier = rd.from_items(
            [
                {"href": f"https://b.example.com/{i}", "n_ref_pages": refs}
                for i, refs in enumerate([5, 5, 3, 1, 1])
            ]
            + [{"href": "https://z.example.com/only", "n_ref_pages": 9}]
        )
        df = (
            frontier_schedule(frontier, per_host_budget=2)
            .to_pandas()
            .sort_values(["host", "fetch_round", "href"], ignore_index=True)
        )
        b = df[df.host == "b.example.com"]
        # order: refs desc then href asc → /0,/1 | /2,/3 | /4
        assert list(b.href.str[-1]) == ["0", "1", "2", "3", "4"]
        assert list(b.fetch_round) == [0, 0, 1, 1, 2]
        z = df[df.host == "z.example.com"]
        assert list(z.fetch_round) == [0]

    def test_page_outdegree_hist_includes_zero(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import page_outdegree_hist

        pages = rd.from_items(
            [
                {"url": "https://a.example.com/p1"},  # 2 links
                {"url": "https://a.example.com/p2"},  # 1 link
                {"url": "https://c.example.com/p9"},  # 2 links
                {"url": "https://d.example.com/empty"},  # 0 links
            ]
        )
        df = (
            page_outdegree_hist(self._links(), pages)
            .to_pandas()
            .sort_values("outdeg", ignore_index=True)
        )
        assert list(zip(df.outdeg, df.n_pages)) == [(0, 1), (1, 1), (2, 2)]

    def test_host_authority_iterated_cycle(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_authority

        rows = [
            ("https://x.com/p1", "https://y.com/a"),
            ("https://x.com/p1", "https://y.com/a"),
            ("https://y.com/p1", "https://x.com/b"),
            ("https://y.com/p1", "https://y.com/c"),
        ]
        links = rd.from_items(
            [
                {"url": u, "pos": i, "href": h, "anchor_text": "t",
                 "chrome": False}
                for i, (u, h) in enumerate(rows)
            ]
        )
        # edges: x→y cnt2, y→x cnt1, y→y cnt1; indeg x=1, y=3
        # score1: x = 1·3 = 3;  y = 2·1 + 1·3 = 5
        # score2: x = 1·5 = 5;  y = 2·3 + 1·5 = 11
        for iters, want in [
            (1, {"x.com": (1, 3), "y.com": (3, 5)}),
            (2, {"x.com": (1, 5), "y.com": (3, 11)}),
        ]:
            df = host_authority(links, iters=iters).to_pandas()
            got = {r.host: (r.n_inlinks, r.authority) for r in df.itertuples()}
            assert got == want, (iters, got)

    def test_host_inlink_degree(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_inlink_degree

        df = (
            host_inlink_degree(self._links())
            .to_pandas()
            .sort_values("host", ignore_index=True)
        )
        got = {
            r.host: (r.n_inlinks, r.n_src_hosts, r.n_ref_pages)
            for r in df.itertuples()
        }
        assert got == {
            "a.example.com": (1, 1, 1),
            "b.example.com": (4, 2, 3),
        }


class TestCollocations:
    def test_integer_gate_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.scrub import collocations

        texts = [
            "new york is big",
            "new york never sleeps",
            "a big apple in new york",
            "york new style",
            "the big apple",
        ]
        df = (
            collocations(rd.from_items([{"text": t} for t in texts]))
            .to_pandas()
            .sort_values(["w1", "w2"], ignore_index=True)
        )
        # brute force
        from collections import Counter

        uni, big = Counter(), Counter()
        for t in texts:
            ws = t.split(" ")
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
        n = sum(big.values())
        want = sorted(
            (w1, w2, c, uni[w1], uni[w2])
            for (w1, w2), c in big.items()
            if c >= 2 and 4 * c * n > 5 * uni[w1] * uni[w2]
        )
        got = [tuple(r) for r in df[["w1", "w2", "cxy", "cx", "cy"]].itertuples(index=False)]
        assert got == want
        assert ("new", "york") in {(a, b) for a, b, *_ in got}


class TestHostComponents:
    def _links(self, edges):
        import ray.data as rd

        return rd.from_items(
            [
                {
                    "url": f"https://{s}/p",
                    "pos": 0,
                    "href": f"https://{d}/q",
                    "anchor_text": "x",
                    "chrome": False,
                }
                for s, d in edges
            ]
        )

    def test_two_components_min_host_canonical(self, ray_session):
        # {a,b,e} via a→b, b→e; {c,d} via d→c; self-loop a→a ignored
        ds = self._links(
            [("a.com", "b.com"), ("b.com", "e.com"), ("d.com", "c.com"),
             ("a.com", "a.com")]
        )
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_components

        df = (
            host_components(ds)
            .to_pandas()
            .sort_values("host", ignore_index=True)
        )
        got = {r.host: (r.comp_host, r.comp_size) for r in df.itertuples()}
        assert got == {
            "a.com": ("a.com", 3),
            "b.com": ("a.com", 3),
            "e.com": ("a.com", 3),
            "c.com": ("c.com", 2),
            "d.com": ("c.com", 2),
        }

    def test_direction_irrelevant(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_components

        fwd = self._links([("a.com", "b.com"), ("c.com", "b.com")])
        rev = self._links([("b.com", "a.com"), ("b.com", "c.com")])
        a = host_components(fwd).to_pandas().sort_values("host", ignore_index=True)
        b = host_components(rev).to_pandas().sort_values("host", ignore_index=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)

    def test_empty_schema_stable(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_components

        empty = rd.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "pos": pa.array([], pa.int64()),
                    "href": pa.array([], pa.string()),
                    "anchor_text": pa.array([], pa.string()),
                    "chrome": pa.array([], pa.bool_()),
                }
            )
        )
        ds = host_components(empty)
        assert sorted(ds.schema().names) == ["comp_host", "comp_size", "host"]
        assert ds.count() == 0

    def test_self_loops_only_is_empty(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import host_components

        ds = self._links([("a.com", "a.com"), ("b.com", "b.com")])
        out = host_components(ds)
        assert out.count() == 0
        assert sorted(out.schema().names) == ["comp_host", "comp_size", "host"]


class TestRobotsGate:
    def _frontier(self, hrefs):
        import ray.data as rd

        return rd.from_items(
            [{"href": h, "n_ref_pages": 1} for h in hrefs]
        )

    def test_longest_prefix_and_ties(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import robots_gate

        rules = [
            ("/private/", False),
            ("/private/public", True),   # longer → overrides
            ("/dup", False),
            ("/dup", True),              # equal length → allow wins
        ]
        hrefs = [
            "https://h.com/private/a",
            "https://h.com/private/public/b",
            "https://h.com/dup/x",
            "https://h.com/other",
            "https://h.com",             # empty path → '/'
            "not a url",                 # unparseable → '/', default
        ]
        df = robots_gate(self._frontier(hrefs), rules).to_pandas()
        got = dict(zip(df["href"], df["allowed"]))
        assert got == {
            "https://h.com/private/a": False,
            "https://h.com/private/public/b": True,
            "https://h.com/dup/x": True,
            "https://h.com/other": True,
            "https://h.com": True,
            "not a url": True,
        }

    def test_rule_order_irrelevant_for_ties(self, ray_session):
        from vlm_ocr_doc_reader_ray.stages.linkgraph import robots_gate

        hrefs = ["https://h.com/dup/x"]
        a = robots_gate(
            self._frontier(hrefs), [("/dup", True), ("/dup", False)]
        ).to_pandas()
        b = robots_gate(
            self._frontier(hrefs), [("/dup", False), ("/dup", True)]
        ).to_pandas()
        assert bool(a["allowed"][0]) is True
        assert bool(b["allowed"][0]) is True


class TestComponentProfile:
    def test_two_components_profiles(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import component_profile

        rows = []
        # host a: 2 links (1 external to b, 1 self) ; host b: 1 link to a
        # host c: 1 link to d ; d never crawls
        for s, d in [("a.com", "b.com"), ("a.com", "a.com"),
                     ("b.com", "a.com"), ("c.com", "d.com")]:
            rows.append(
                {"url": f"https://{s}/p", "pos": 0, "href": f"https://{d}/q",
                 "anchor_text": "x", "chrome": False}
            )
        df = (
            component_profile(rd.from_items(rows).repartition(2))
            .to_pandas()
            .sort_values("comp_host", ignore_index=True)
        )
        got = {
            r.comp_host: (r.n_hosts, r.n_crawled_hosts, r.links_total,
                          r.external_total)
            for r in df.itertuples()
        }
        # {a,b}: both crawled, 3 links total, 2 external
        # {c,d}: only c crawled, 1 link, 1 external
        assert got == {"a.com": (2, 2, 3, 2), "c.com": (2, 1, 1, 1)}

    def test_empty_schema_stable(self, ray_session):
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.stages.linkgraph import component_profile

        empty = rd.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "pos": pa.array([], pa.int64()),
                    "href": pa.array([], pa.string()),
                    "anchor_text": pa.array([], pa.string()),
                    "chrome": pa.array([], pa.bool_()),
                }
            )
        )
        ds = component_profile(empty)
        assert sorted(ds.schema().names) == [
            "comp_host", "external_total", "links_total",
            "n_crawled_hosts", "n_hosts",
        ]
        assert ds.count() == 0
