"""Level-2 verification: normalized majority vote across axes.

Behavioral parity with the reference (semantics, not code):

- ``normalize_for_vote``  — reference ``core/voting.py:30-41``
- ``majority_vote``       — reference ``core/voting.py:44-89``
- ``normalize_ocr_digits``— reference ``utils/normalization.py:6-72``

Vote contract (pinned by ``tests/test_voting.py``, which ports the
reference's conformance table ``tests/test_core/test_voting.py``):

- only samples with status ``ok`` / ``no_data`` vote; ``error`` rows
  are excluded from the denominator,
- votes group by the *normalized* value; the winner is the largest
  group, ties broken by earliest first appearance in axis order,
- the reported ``value`` is the first winning sample's ORIGINAL value
  (outer whitespace stripped), or ``""`` when no-data wins,
- ``confidence = "k/N"`` with N = count of valid voters,
- ``verified`` only when the vote is unanimous AND nothing errored.

Axis order is an explicit input here (samples must arrive sorted by
their ``axis`` field) — under distributed execution arrival order is
meaningless, so the tie-break key is data, not scheduling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

NO_DATA_KEY = "__NO_DATA__"

# OCR confusion pairs: letter glyph -> digit it is usually misread from.
_DIGIT_FIXES = str.maketrans({"O": "0", "o": "0", "l": "1", "I": "1", "S": "5", "B": "8"})
_SEPARATORS = str.maketrans({" ": None, "\xa0": None, "-": None})


class Sample(NamedTuple):
    """One extraction sample for an entity along one axis."""

    value: Optional[str]
    context: Optional[str]
    status: str = "ok"  # 'ok' | 'no_data' | 'error'


class VoteResult(NamedTuple):
    value: str
    context: Optional[str]
    confidence: str
    verified: bool


def normalize_for_vote(value: Optional[str]) -> str:
    """Fold a raw value to its voting key.

    None / blank → the no-data sentinel; otherwise whitespace-collapsed
    lowercase (punctuation untouched).
    """
    if value is None:
        return NO_DATA_KEY
    parts = value.split()
    if not parts:
        return NO_DATA_KEY
    return " ".join(parts).lower()


def majority_vote(samples: Sequence[Sample]) -> VoteResult:
    """Combine N axis samples into (value, context, confidence, verified)."""
    total = len(samples)
    voters = [s for s in samples if s.status in ("ok", "no_data")]
    if not voters:
        return VoteResult("", None, f"0/{total}", False)

    # Tally by normalized key, remembering first-seen order and the
    # first original sample of each group (insertion order of dicts
    # gives the earliest-axis tie-break for free).
    tally: dict[str, int] = {}
    first_of: dict[str, Sample] = {}
    for s in voters:
        key = normalize_for_vote(s.value)
        if key not in tally:
            tally[key] = 0
            first_of[key] = s
        tally[key] += 1

    best_key = None
    best_count = -1
    for key, count in tally.items():  # insertion order == earliest axis first
        if count > best_count:
            best_key, best_count = key, count

    winner = first_of[best_key]
    if best_key == NO_DATA_KEY:
        out_value = ""
    else:
        out_value = (winner.value or "").strip()

    n = len(voters)
    return VoteResult(
        value=out_value,
        context=winner.context,
        confidence=f"{best_count}/{n}",
        verified=(best_count == n and n == total),
    )


def normalize_ocr_digits(raw: Optional[str], expected_length: Optional[int] = None) -> Optional[str]:
    """Repair common OCR digit confusions and strip separators.

    ``O/o→0, l/I→1, S→5, B→8``; spaces, NBSP and hyphens removed; the
    result is the remaining digit characters only. Returns None when no
    digits survive or when ``expected_length`` is given and not met.
    """
    if raw is None:
        return None
    cleaned = str(raw).translate(_SEPARATORS).translate(_DIGIT_FIXES)
    digits = "".join(c for c in cleaned if c.isdigit())
    if expected_length is not None and len(digits) != expected_length:
        return None
    return digits if digits else None
