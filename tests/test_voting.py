"""Conformance table for vote/normalize semantics.

Ports the reference's pinned behavior table
(``/root/reference/02_src/tests/test_core/test_voting.py`` and
``tests/test_utils/test_normalization.py``) against our
reimplementation — these cases ARE the spec for level-2 verify.
"""

from vlm_ocr_doc_reader_ray.extract.voting import (
    NO_DATA_KEY,
    Sample,
    majority_vote,
    normalize_for_vote,
    normalize_ocr_digits,
)


class TestNormalizeForVote:
    def test_none_and_blank_are_no_data(self):
        assert normalize_for_vote(None) == NO_DATA_KEY
        assert normalize_for_vote("") == NO_DATA_KEY
        assert normalize_for_vote("   ") == NO_DATA_KEY

    def test_strip_lower_collapse(self):
        assert normalize_for_vote("  ABC  ") == "abc"
        assert normalize_for_vote("1\n2\t3   4") == "1 2 3 4"

    def test_punctuation_untouched(self):
        assert normalize_for_vote("7704-123-456") == "7704-123-456"


class TestMajorityVote:
    def test_unanimous(self):
        v = majority_vote([Sample("7704123456", "ctx", "ok")] * 3)
        assert v == ("7704123456", "ctx", "3/3", True)

    def test_majority_2_of_3(self):
        v = majority_vote(
            [Sample("x1", "a", "ok"), Sample("x1", "b", "ok"), Sample("x2", "c", "ok")]
        )
        assert (v.value, v.confidence, v.verified) == ("x1", "2/3", False)

    def test_all_different_picks_first(self):
        v = majority_vote(
            [Sample("a", "c1", "ok"), Sample("b", "c2", "ok"), Sample("c", "c3", "ok")]
        )
        assert v == ("a", "c1", "1/3", False)

    def test_no_data_wins(self):
        v = majority_vote(
            [
                Sample("", None, "no_data"),
                Sample(None, None, "no_data"),
                Sample("spurious", "ctx", "ok"),
            ]
        )
        assert v == ("", None, "2/3", False)

    def test_normalization_groups_case(self):
        v = majority_vote(
            [
                Sample("OOO Rosatom", "c1", "ok"),
                Sample("ooo rosatom", "c2", "ok"),
                Sample("Other", "c3", "ok"),
            ]
        )
        assert (v.value, v.context, v.confidence) == ("OOO Rosatom", "c1", "2/3")

    def test_errors_excluded_from_denominator(self):
        v = majority_vote(
            [Sample("x", "c", "ok"), Sample("x", "c2", "ok"), Sample(None, None, "error")]
        )
        assert (v.value, v.confidence, v.verified) == ("x", "2/2", False)

    def test_all_errors(self):
        v = majority_vote([Sample(None, None, "error")] * 2)
        assert v == ("", None, "0/2", False)

    def test_empty_input(self):
        assert majority_vote([]) == ("", None, "0/0", False)

    def test_tie_prefers_earlier_axis(self):
        v = majority_vote([Sample("axis1", "c1", "ok"), Sample("axis2", "c2", "ok")])
        assert v == ("axis1", "c1", "1/2", False)

    def test_original_value_preserved(self):
        v = majority_vote(
            [Sample("  Hello\tWorld  ", "ctx", "ok"), Sample("hello world", "c2", "ok")]
        )
        assert (v.value, v.confidence) == ("Hello\tWorld", "2/2")


class TestNormalizeOcrDigits:
    def test_confusion_pairs(self):
        assert normalize_ocr_digits("O123") == "0123"
        assert normalize_ocr_digits("l23-456") == "123456"
        assert normalize_ocr_digits("SB123") == "58123"

    def test_separators_removed(self):
        assert normalize_ocr_digits("12 34\xa056-78") == "12345678"

    def test_expected_length_gate(self):
        assert normalize_ocr_digits("123", expected_length=3) == "123"
        assert normalize_ocr_digits("123", expected_length=5) is None

    def test_none_and_no_digits(self):
        assert normalize_ocr_digits(None) is None
        assert normalize_ocr_digits("abc") is None
