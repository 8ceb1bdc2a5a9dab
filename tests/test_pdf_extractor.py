"""Unit spec for the PDF-layout path: margins, fonts, XY-cut ordering."""

import json

from vlm_ocr_doc_reader_ray.extract.pdf_extractor import SPDF_MAGIC, extract_pdf, xy_cut, _LayoutBlock

W12 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def _payload(pages) -> bytes:
    return SPDF_MAGIC + json.dumps({"pages": pages}).encode()


def _blk(x0, y0, x1, y1, text, font=10.5):
    return {"x0": x0, "y0": y0, "x1": x1, "y1": y1, "text": text, "font_size": font}


def test_two_columns_read_left_then_right():
    page = {
        "page_num": 1, "width": 612, "height": 792,
        "blocks": [  # stored right column first: order must not matter
            _blk(322, 60, 562, 360, f"THIRD {W12}"),
            _blk(50, 400, 290, 700, f"SECOND {W12}"),
            _blk(50, 60, 290, 360, f"FIRST {W12}"),
        ],
    }
    r = extract_pdf(_payload([page]))
    assert [t.split()[0] for t in r.text.split("\n\n")] == ["FIRST", "SECOND", "THIRD"]


def test_margin_and_small_font_blocks_dropped():
    page = {
        "page_num": 1, "width": 612, "height": 792,
        "blocks": [
            _blk(50, 20, 562, 40, "running header junk", 8.0),
            _blk(250, 752, 362, 772, "Page 1 of 9", 8.0),
            _blk(50, 60, 562, 360, W12),
        ],
    }
    r = extract_pdf(_payload([page]))
    assert r.text == W12
    assert r.n_blocks_dropped == 2


def test_multi_page_order_and_pages():
    pages = [
        {"page_num": 2, "width": 612, "height": 792, "blocks": [_blk(50, 60, 562, 360, f"PAGETWO {W12}")]},
        {"page_num": 1, "width": 612, "height": 792, "blocks": [_blk(50, 60, 562, 360, f"PAGEONE {W12}")]},
    ]
    r = extract_pdf(_payload(pages))
    assert r.text.startswith("PAGEONE")
    assert "PAGETWO" in r.text
    assert r.page_count == 2


def test_font_heading_levels():
    pages = [{"page_num": 1, "width": 612, "height": 792, "blocks": [
        _blk(50, 60, 290, 360, "Big Title", 18.0),
        _blk(50, 400, 290, 700, W12),
    ]}]
    r = extract_pdf(_payload(pages))
    assert r.headers == [(1, "Big Title", 1)]


def test_corrupt_payload_is_failure_data():
    r = extract_pdf(SPDF_MAGIC + b'{"pages": [truncated')
    assert r.parse_status == "failed"
    assert r.text == ""


def test_xy_cut_tie_break_is_total_order():
    # identical geometry except text: leaf ordering must use text key
    blocks = [_LayoutBlock(_blk(50, 60, 290, 80, t)) for t in ["bbb", "aaa"]]
    assert [b.text for b in xy_cut(blocks)] == ["aaa", "bbb"]


def test_xy_cut_invariant_to_input_order():
    base = [
        _blk(50, 60, 290, 360, "one"),
        _blk(50, 400, 290, 700, "two"),
        _blk(322, 60, 562, 360, "three"),
        _blk(322, 400, 562, 700, "four"),
    ]
    import itertools

    expected = ["one", "two", "three", "four"]
    for perm in itertools.permutations(base):
        got = [b.text for b in xy_cut([_LayoutBlock(d) for d in perm])]
        assert got == expected
