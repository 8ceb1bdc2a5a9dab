"""Unit spec for the HTML block segmenter + density classifier."""

from vlm_ocr_doc_reader_ray.extract.html_extractor import extract_html, segment_html

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 words


def _doc(body: str) -> bytes:
    return f"<html><head><title>t</title></head><body>{body}</body></html>".encode()


def test_basic_paragraph_kept():
    r = extract_html(_doc(f"<p>{LONG}</p>"))
    assert r.text == LONG
    assert r.parse_status == "ok"
    assert r.n_blocks_kept == 1


def test_chrome_ancestry_dropped():
    r = extract_html(_doc(f"<nav><p>{LONG}</p></nav><header><p>{LONG}</p></header><p>{LONG}</p>"))
    assert r.text == LONG
    assert r.n_blocks_dropped == 2


def test_link_dense_block_dropped():
    links = "".join(f'<a href="/x{i}">some linked words here</a> ' for i in range(5))
    r = extract_html(_doc(f"<div>{links}</div><p>{LONG}</p>"))
    assert r.text == LONG


def test_anchor_text_counts_but_sparse_links_survive():
    # one short link inside a long paragraph: density below threshold
    body = f"<p>{LONG} <a href='/x'>tiny link</a> {LONG}</p>"
    r = extract_html(_doc(body))
    assert "tiny link" in r.text


def test_short_block_dropped_without_neighbours():
    r = extract_html(_doc("<p>too short</p>"))
    assert r.text == ""
    assert r.parse_status == "empty"


def test_smoothing_keeps_short_block_between_kept():
    r = extract_html(_doc(f"<p>{LONG}</p><p>short middle quote</p><p>{LONG}</p>"))
    assert r.text == f"{LONG}\n\nshort middle quote\n\n{LONG}"


def test_headings_collected_with_levels():
    r = extract_html(_doc(f"<h1>Main Title</h1><p>{LONG}</p><h2>Sub Part</h2><p>{LONG}</p>"))
    assert r.headers == [(1, "Main Title", 1), (2, "Sub Part", 1)]
    assert r.text.startswith("Main Title\n\n")


def test_spans_cover_text_exactly():
    r = extract_html(_doc(f"<h1>Title Here</h1><p>{LONG}</p>"))
    for start, end, _kind, _src in r.spans:
        assert r.text[start:end] in ("Title Here", LONG)
    assert r.spans[0][0] == 0
    assert r.spans[-1][1] == len(r.text)


def test_script_style_ignored():
    r = extract_html(_doc(f"<script>var x = 'aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk';</script><p>{LONG}</p>"))
    assert r.text == LONG


def test_entities_unescaped_and_ws_collapsed():
    r = extract_html(_doc("<p>a &amp; b   c\n d e f g h i j k l</p>"))
    assert r.text == "a & b c d e f g h i j k l"


def test_malformed_html_is_lenient_not_fatal():
    r = extract_html(b"<p>" + LONG.encode() + b"<div><p>unclosed everywhere")
    assert r.parse_status in ("ok", "empty")
    assert LONG in r.text


def test_invalid_utf8_is_failure_data():
    r = extract_html(b"\xff\xfe\x00broken")
    assert r.parse_status == "failed"
    assert r.text == ""


def test_segmentation_order_is_document_order():
    blocks = segment_html(f"<p>first {LONG}</p><p>second {LONG}</p>")
    assert [b.index for b in blocks] == [0, 1]
    assert blocks[0].text.startswith("first")


def test_fast_frontend_matches_stdlib_on_corpus(small_documents):
    """Differential: regex tokenizer == stdlib HTMLParser, block for block."""
    from vlm_ocr_doc_reader_ray.corpus.generator import build_html, is_corrupt_doc, is_pdf_doc

    checked = 0
    for doc_id, text, lang, source in small_documents:
        if is_corrupt_doc(doc_id) or is_pdf_doc(doc_id):
            continue
        html = build_html(doc_id, text, lang, source).decode()
        a = segment_html(html, "fast")
        b = segment_html(html, "stdlib")
        assert [
            (x.text, x.tag, x.anchor_chars, x.chrome, x.heading_level) for x in a
        ] == [(x.text, x.tag, x.anchor_chars, x.chrome, x.heading_level) for x in b]
        checked += 1
    assert checked > 300


def test_fast_frontend_matches_stdlib_on_nasty_html():
    cases = [
        "<p>a < b and c > d " + LONG + "</p>",
        "<script>var s = '<p>not a tag</p>';</script><p>" + LONG + "</p>",
        "<!-- <p>commented out</p> --><p>" + LONG + "</p>",
        "<P>UPPER CASE TAGS " + LONG + "</P>",
        "<p>" + LONG + "<br/>after break</p>",
        "<p>&lt;escaped&gt; &amp; fine " + LONG + "</p>",
        "<div data-x='q>u'>attr with gt " + LONG + "</div>",
        "<p>" + LONG,  # unclosed at EOF
    ]
    for html in cases:
        a = segment_html(html, "fast")
        b = segment_html(html, "stdlib")
        assert [(x.text, x.tag, x.anchor_chars) for x in a] == [
            (x.text, x.tag, x.anchor_chars) for x in b
        ], html[:60]
