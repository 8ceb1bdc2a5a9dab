"""Entity registry: scan → resolve (level 1) → verify (level 2).

The reference's central record is ``OCRRegistryEntry``
(``core/state.py:45-67``): one precision-critical atomic entity (URL,
ID, date, …) with a page anchor, a pointwise-extraction prompt, a
resolution level 0/1/2, and vote metadata. Its deterministic stand-ins
here:

- **scan**: regex recognizers over the extracted text discover
  entities and synthesize the upsert key with the reference's id rule
  ``scan_{page}_{sha256(prompt)[:8]}`` (``operations/scan.py:159-166``)
  — kept verbatim because it is the dedup/upsert key;
- **resolve** (level 1): anchored re-extraction — re-run the entity's
  recognizer inside a context window around its span
  (deterministic analogue of the pointwise OCR call,
  ``core/ocr_client.py:202-371``), keeping the reference's
  ok/no_data/error status contract (``core/ocr_client.py:103-134``);
- **verify** (level 2): N axes re-resolve with different window radii;
  samples combine by normalized majority vote
  (``core/voting.py:44-89``) → ``confidence="k/N"``, ``verified`` iff
  unanimous. ADR-002 semantics: verify targets ALL entities, not only
  pending ones (``core/reader.py:465-469``).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, replace
from typing import List, Optional, Sequence

from vlm_ocr_doc_reader_ray.extract.blocks import ExtractResult
from vlm_ocr_doc_reader_ray.extract.voting import Sample, majority_vote

# Recognizer bank: (kind, compiled regex). Order fixes tie-breaks when
# two kinds match at the same offset.
RECOGNIZERS: List[tuple[str, re.Pattern]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")),
    ("url", re.compile(r"https?://[^\s\"'<>]+")),
    ("phone", re.compile(r"\+\d{1,2}-\d{3}-\d{4}\b")),
    ("date", re.compile(r"\b\d{4}-\d{2}-\d{2}\b")),
    ("id", re.compile(r"\b[A-Z]{2,6}-\d{4,12}\b")),
]
_RECOGNIZER_MAP = dict(RECOGNIZERS)
_TRAILING_PUNCT = ".,;:!?)"
_CONTEXT_RADIUS = 30


def register_recognizer(kind: str, pattern: str, clean_trailing: bool = False) -> None:
    """User-extension surface: add an entity recognizer.

    The Ray-native descendant of the reference's tool registration
    (``core/vlm_agent.py:48-62``): instead of registering an agent
    tool, extensions register a (kind → regex) recognizer that the
    scan/resolve/verify chain then treats exactly like the built-ins.
    Must be called before building pipelines (actors compile the bank
    at init). Re-registering a kind replaces it."""
    rx = re.compile(pattern)
    for i, (k, _r) in enumerate(RECOGNIZERS):
        if k == kind:
            RECOGNIZERS[i] = (kind, rx)
            break
    else:
        RECOGNIZERS.append((kind, rx))
    _RECOGNIZER_MAP[kind] = rx
    if clean_trailing:
        _CLEAN_TRAILING_KINDS.add(kind)


_CLEAN_TRAILING_KINDS = {"url", "email"}


@dataclass(frozen=True)
class RegistryEntry:
    """One entity row (columnar twin of the reference's OCRRegistryEntry)."""

    entity_id: str
    page_num: int
    kind: str
    prompt: str
    resolution: int  # 0=scan, 1=resolved, 2=verified
    value: Optional[str]
    context: Optional[str]
    verified: bool
    confidence: Optional[str]
    span_start: int
    span_end: int
    status: str = "ok"  # resolve status: ok | no_data | error


def _clean_match(kind: str, raw: str) -> str:
    """Strip trailing sentence punctuation from open-ended matches."""
    if kind in _CLEAN_TRAILING_KINDS:
        return raw.rstrip(_TRAILING_PUNCT)
    return raw


def scan_entities(result: ExtractResult) -> List[RegistryEntry]:
    """Discover entities in extracted text (resolution level 0)."""
    text = result.text
    found: List[tuple[int, int, str, str]] = []  # (start, kind_rank, kind, value)
    for rank, (kind, rx) in enumerate(RECOGNIZERS):
        for m in rx.finditer(text):
            value = _clean_match(kind, m.group(0))
            if value:
                found.append((m.start(), rank, kind, value))
    found.sort()

    entries: List[RegistryEntry] = []
    for start, _rank, kind, value in found:
        end = start + len(value)
        page = result.page_of_offset(start)
        prompt = f"Extract the {kind} at offset {start}"
        digest = hashlib.sha256(prompt.encode("utf-8")).hexdigest()[:8]
        entries.append(
            RegistryEntry(
                entity_id=f"scan_{page}_{digest}",
                page_num=page,
                kind=kind,
                prompt=prompt,
                resolution=0,
                value=value,
                context=text[max(0, start - _CONTEXT_RADIUS): end + _CONTEXT_RADIUS],
                verified=False,
                confidence=None,
                span_start=start,
                span_end=end,
            )
        )
    return entries


def _window_extract(entry: RegistryEntry, text: str, radius: int) -> Sample:
    """Re-run the entry's recognizer inside a window around its span.

    The deterministic analogue of one pointwise OCR call: `ok` when the
    recognizer still fires in the window, `no_data` when it does not,
    `error` when the entry is malformed (page/span outside the text) —
    the reference's three-way status contract.
    """
    return _window_extract_pos(entry, text, radius)[0]


def _window_extract_pos(
    entry: RegistryEntry, text: str, radius: int
) -> tuple[Sample, int, int]:
    """`_window_extract` + the match's (start, end) in ``text``
    (-1, -1 when there is no match) — lets callers prove window
    containment for the verify fast path."""
    if entry.span_start < 0 or entry.span_start >= len(text):
        return Sample(None, None, "error"), -1, -1
    rx = _RECOGNIZER_MAP.get(entry.kind)
    if rx is None:
        return Sample(None, None, "error"), -1, -1
    lo = max(0, entry.span_start - radius)
    hi = min(len(text), entry.span_end + radius)
    m = rx.search(text, lo, hi)
    if m is None:
        return Sample(None, None, "no_data"), -1, -1
    value = _clean_match(entry.kind, m.group(0))
    ctx = text[max(0, m.start() - _CONTEXT_RADIUS): m.end() + _CONTEXT_RADIUS]
    return Sample(value, ctx, "ok"), m.start(), m.end()


def resolve_entry(entry: RegistryEntry, text: str, radius: int = 40) -> RegistryEntry:
    """Level 1: pointwise anchored re-extraction (reference resolve pass)."""
    s = _window_extract(entry, text, radius)
    return replace(
        entry,
        resolution=max(entry.resolution, 1),
        value=s.value if s.status == "ok" else entry.value,
        context=s.context if s.status == "ok" else entry.context,
        status=s.status,
    )


def verify_entry(
    entry: RegistryEntry, text: str, axes: Sequence[int] = (1, 3, 5)
) -> RegistryEntry:
    """Level 2: N independent passes (axis k → window radius 40*k) + vote."""
    samples = [_window_extract(entry, text, 40 * axis) for axis in axes]
    vote = majority_vote(samples)
    if vote.confidence.startswith("0/"):
        # all-error: keep previous state (reference core/reader.py:501-507)
        return entry
    return replace(
        entry,
        resolution=2,
        value=vote.value,
        context=vote.context,
        verified=vote.verified,
        confidence=vote.confidence,
        status="ok" if vote.value else "no_data",
    )


def chunked_resolve(
    entries: Sequence[RegistryEntry],
    text: str,
    chunk_size: int = 5,
    radius: int = 40,
) -> List[RegistryEntry]:
    """Chunked resolve pass with the reference's alignment contract.

    Reproduces the G2/J2/J3 semantics of the reference resolve loop
    (``core/reader.py:297-363``):

    - entries are grouped by page (ascending) and split into fixed
      chunks of ``chunk_size`` (G2, ``reader.py:307-308``);
    - the result map is initialized to ALL-ERROR keyed by entity_id
      (J3, ``reader.py:310-313``) — a chunk that produces fewer
      results than tasks leaves error rows behind, it never drops or
      crashes;
    - chunk results align to entries positionally (J2,
      ``reader.py:348-363``); extras beyond the chunk are ignored.

    Deterministic engine note: every task yields a sample, so the
    error-padding path only fires for malformed entries — exactly the
    rows the reference would also mark as errors.
    """
    by_page: dict[int, List[RegistryEntry]] = {}
    for e in entries:
        by_page.setdefault(e.page_num, []).append(e)

    results: dict[str, RegistryEntry] = {
        e.entity_id: replace(e, resolution=max(e.resolution, 1), status="error")
        for e in entries
    }
    for page in sorted(by_page):
        page_entries = sorted(by_page[page], key=lambda e: e.span_start)
        for i in range(0, len(page_entries), chunk_size):
            chunk = page_entries[i: i + chunk_size]
            chunk_results = [resolve_entry(e, text, radius) for e in chunk]
            for e, r in zip(chunk, chunk_results):  # positional zip (J2)
                results[e.entity_id] = r
    return [results[e.entity_id] for e in entries]


def _axis_samples(
    e: RegistryEntry, text: str, axes: Sequence[int]
) -> List[Sample]:
    """Per-axis verify samples with a single-search fast path.

    Every axis window is a superset of the smallest one and a subset
    of the largest, so
     - no match in the LARGEST window → no match in any (all samples
       identical no_data);
     - 'error' depends only on span validity → identical;
     - the largest window's FIRST match lying fully inside the
       SMALLEST window's bounds means it is also the first match of
       every window in between → all samples identical.
    Only a match outside the smallest bounds (another instance of the
    same kind nearby) needs the per-axis searches — equality with the
    naive per-axis chain is pinned by test_registry (corpus + an
    adversarial repeated-entity case that forces the slow path)."""
    rmin, rmax = 40 * min(axes), 40 * max(axes)
    big, mstart, mend = _window_extract_pos(e, text, rmax)
    if big.status != "ok" or (
        mstart >= max(0, e.span_start - rmin)
        and mend <= min(len(text), e.span_end + rmin)
    ):
        return [big] * len(axes)
    return [_window_extract(e, text, 40 * axis) for axis in axes]


def build_registry(
    result: ExtractResult, axes: Sequence[int] = (1, 3, 5)
) -> List[RegistryEntry]:
    """Full scan → resolve → verify chain for one document (pipelined).

    Because entities are derived from the document row being processed,
    resolve/verify co-partition with the document for free — no shuffle
    (SURVEY §2.4 J1: pipelined co-partitioning beats a hash join).
    The shuffle-based grouped-vote variant lives in
    ``stages/registry_stage.py`` for registry tables re-read from a
    checkpoint.
    """
    text = result.text
    out = []
    for e in scan_entities(result):
        # Fused resolve+verify: _window_extract's 'error' status depends
        # only on span validity / kind (not radius), so the axis samples
        # subsume the resolve pass; tests/test_registry.py pins this
        # fast path equal to the explicit resolve_entry→verify_entry
        # chain on the whole corpus.
        samples = _axis_samples(e, text, axes)
        vote = majority_vote(samples)
        if vote.confidence.startswith("0/"):
            out.append(replace(e, resolution=1, status="error"))
            continue
        out.append(
            RegistryEntry(
                entity_id=e.entity_id,
                page_num=e.page_num,
                kind=e.kind,
                prompt=e.prompt,
                resolution=2,
                value=vote.value,
                context=vote.context,
                verified=vote.verified,
                confidence=vote.confidence,
                span_start=e.span_start,
                span_end=e.span_end,
                status="ok" if vote.value else "no_data",
            )
        )
    return out


def process_document(payload: bytes, axes: Sequence[int] = (1, 3, 5)):
    """(ExtractResult, registry rows) for one raw payload — the complete
    deterministic analogue of the reference's scan+resolve+verify
    lifecycle on a single document."""
    from vlm_ocr_doc_reader_ray.extract.document import extract_document

    result = extract_document(payload)
    entries = build_registry(result, axes) if result.parse_status == "ok" else []
    return result, entries
