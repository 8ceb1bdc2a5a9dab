"""CLI arg grammar parity with the reference (``cli.py:47-108``)."""

import pytest

from vlm_ocr_doc_reader_ray.cli import parse_axes_arg, parse_pages_arg


class TestParsePages:
    def test_none_and_empty_mean_all(self):
        assert parse_pages_arg(None) is None
        assert parse_pages_arg("") is None
        assert parse_pages_arg("   ") is None

    def test_singles_and_ranges(self):
        assert parse_pages_arg("1,2,5-7") == [1, 2, 5, 6, 7]
        assert parse_pages_arg("3") == [3]
        assert parse_pages_arg("2-2") == [2]

    def test_dedupe_and_sort(self):
        assert parse_pages_arg("7,1,3-5,4") == [1, 3, 4, 5, 7]

    def test_errors(self):
        for bad in ["1-2-3", "0", "a", "2-1", "1,,2", "-3"]:
            with pytest.raises(ValueError):
                parse_pages_arg(bad)


class TestParseAxes:
    def test_default(self):
        assert parse_axes_arg(None) == [1, 3, 5]
        assert parse_axes_arg("") == [1, 3, 5]

    def test_explicit(self):
        assert parse_axes_arg("1,3,5") == [1, 3, 5]
        assert parse_axes_arg("2") == [2]

    def test_errors(self):
        for bad in ["0", "-1", "a", "1,x"]:
            with pytest.raises(ValueError):
                parse_axes_arg(bad)
