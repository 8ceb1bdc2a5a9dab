"""Property-based invariants (hypothesis).

- fast tokenizer ≡ stdlib HTMLParser on generated HTML
- XY-cut reading order is invariant to input permutation
- vote winner never depends on sample multiplicity encoding
- paragraphs_of: words are conserved, order preserved, tail rule holds
"""

from hypothesis import given, settings, strategies as st

from vlm_ocr_doc_reader_ray.corpus.generator import paragraphs_of
from vlm_ocr_doc_reader_ray.extract.html_extractor import segment_html
from vlm_ocr_doc_reader_ray.extract.pdf_extractor import _LayoutBlock, xy_cut
from vlm_ocr_doc_reader_ray.extract.voting import Sample, majority_vote

_word = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
_words = st.lists(_word, min_size=1, max_size=120)

_tag = st.sampled_from(["p", "div", "h1", "li", "span", "em", "a", "nav", "td"])


@st.composite
def _html(draw):
    parts = []
    for _ in range(draw(st.integers(0, 12))):
        tag = draw(_tag)
        body = " ".join(draw(st.lists(_word, min_size=0, max_size=20)))
        closed = draw(st.booleans())
        parts.append(f"<{tag}>{body}" + (f"</{tag}>" if closed else ""))
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(_html())
def test_fast_equals_stdlib_on_generated_html(html):
    a = segment_html(html, "fast")
    b = segment_html(html, "stdlib")
    assert [(x.text, x.tag, x.anchor_chars, x.chrome, x.heading_level) for x in a] == [
        (x.text, x.tag, x.anchor_chars, x.chrome, x.heading_level) for x in b
    ]


@st.composite
def _layout(draw):
    n = draw(st.integers(1, 10))
    blocks = []
    for i in range(n):
        col = draw(st.integers(0, 1))
        row = draw(st.integers(0, 2))
        x0 = 50.0 + col * 272.0
        y0 = 60.0 + row * 230.0
        blocks.append(
            {
                "x0": x0, "y0": y0, "x1": x0 + 240.0, "y1": y0 + 200.0,
                "text": f"block {i}", "font_size": 10.5,
            }
        )
    return blocks


@settings(max_examples=80, deadline=None)
@given(_layout(), st.randoms(use_true_random=False))
def test_xy_cut_permutation_invariant(blocks, rnd):
    base = [b.text for b in xy_cut([_LayoutBlock(d) for d in blocks])]
    shuffled = list(blocks)
    rnd.shuffle(shuffled)
    got = [b.text for b in xy_cut([_LayoutBlock(d) for d in shuffled])]
    assert got == base


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=6)),
            st.sampled_from(["ok", "no_data", "error"]),
        ),
        max_size=8,
    )
)
def test_vote_confidence_consistent(raw):
    samples = [Sample(v, None, s) for v, s in raw]
    value, _ctx, confidence, verified = majority_vote(samples)
    k, n = (int(x) for x in confidence.split("/"))
    voters = [s for s in samples if s.status in ("ok", "no_data")]
    assert n == (len(voters) if voters else len(samples))
    assert 0 <= k <= n
    if verified:
        assert k == n == len(samples)
    if not voters:
        assert value == "" and k == 0


@settings(max_examples=200, deadline=None)
@given(_words)
def test_paragraphs_conserve_words(words):
    text = " ".join(words)
    paras = paragraphs_of(text)
    assert " ".join(paras).split(" ") == words
    # no paragraph except a singleton document is shorter than the tail rule
    if len(paras) > 1:
        assert all(len(p.split(" ")) >= 10 for p in paras[1:])


@settings(deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=200))
def test_popcount64_matches_python_bin(vals):
    import numpy as np

    from vlm_ocr_doc_reader_ray.stages.dedup import popcount64

    got = popcount64(np.array(vals, dtype=np.uint64))
    want = [bin(v).count("1") for v in vals]
    assert got.tolist() == want


@settings(deadline=None)
@given(st.sets(st.text(alphabet="abcdefgh0123456789-", min_size=1, max_size=20),
               min_size=1, max_size=300))
def test_bloom_never_false_negative(keys):
    from vlm_ocr_doc_reader_ray.stages.relational import BloomFilter

    keys = sorted(keys)
    bf = BloomFilter(len(keys))
    bf.add_many(keys)
    assert bf.might_contain(keys).all()


@settings(deadline=None)
@given(st.text(alphabet="ab c\nd\te", max_size=60))
def test_word_shingles_matches_sql_split_semantics(text):
    """word_shingles must behave exactly like the SQL mirror's
    string_split(text, ' ') + list_slice construction on ANY input."""
    import duckdb

    from vlm_ocr_doc_reader_ray.stages.dedup import word_shingles

    got = word_shingles(text, 3)
    want = duckdb.sql(
        """
        SELECT CASE WHEN nw < 3 THEN [array_to_string(ws, ' ')]
               ELSE list_transform(range(0, nw - 2),
                    i -> array_to_string(list_slice(ws, i + 1, i + 3), ' '))
               END AS sh
        FROM (SELECT string_split($1, ' ') AS ws, len(string_split($1, ' ')) AS nw)
        """,
        params=[text],
    ).fetchone()[0]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(_word, min_size=1, max_size=60),
       st.integers(min_value=0, max_value=3))
def test_gopher_signals_one_matches_bruteforce(words, dup_factor):
    """Pin the per-doc Gopher kernel against an independently-written
    brute force (list.count everywhere, max() with explicit tie scan
    instead of Counter/min) on adversarial word lists — repetition
    injected by multiplying the list."""
    from vlm_ocr_doc_reader_ray.stages.scrub import gopher_signals_one

    words = words * (dup_factor + 1)
    t = " ".join(words)
    got = gopher_signals_one(t, 8)

    # brute force twin
    ws = t.split(" ")
    nw, nc = len(ws), len(t)
    lines = [" ".join(ws[i:i + 8]) for i in range(0, nw, 8)]
    n_lines = len(lines)
    dup_lines = sum(1 for i, ln in enumerate(lines) if ln in lines[:i])
    line_chars = sum(len(ln) for ln in lines)
    dup_line_chars = sum(
        len(ln) for i, ln in enumerate(lines) if ln in lines[:i]
    )
    g2 = [" ".join(ws[i:i + 2]) for i in range(nw - 1)]
    top2 = 0
    if g2:
        best = sorted(set(g2), key=lambda g: (-g2.count(g), g))[0]
        top2 = g2.count(best) * len(best)
    g5 = [" ".join(ws[i:i + 5]) for i in range(nw - 4)] if nw >= 5 else []
    dup5 = sum(
        g5.count(g) * len(g) for g in set(g5) if g5.count(g) >= 2
    )

    def ppm(a, b):
        return 0 if b == 0 else (a * 2_000_000 + b) // (2 * b)

    assert got == (
        n_lines,
        ppm(dup_lines, n_lines),
        ppm(dup_line_chars, line_chars),
        ppm(top2, nc),
        ppm(dup5, nc),
    )
