"""Defensive payload parsing + registry sanitization.

The reference never trusts serialized state: JSON fences are stripped
(``operations/scan.py:70-76``), scan payloads are coerced field by
field with an empty-payload fallback (``operations/scan.py:79-123``),
invalid registry rows are skipped / coerced on every load
(``core/state.py:25-42,158-163``) and header entries missing
level/title/page are dropped (``operations/full_description.py:304-346``).
This module reproduces those contracts for our checkpoint-loading
path: a registry Parquet written by any engine version is sanitized
batch-wise before use — bad rows become dropped rows, never
exceptions.
"""

from __future__ import annotations

import json
import re
from typing import Any, List, Optional

import pyarrow as pa

_FENCE_RX = re.compile(r"```(?:json)?\s*\n?(.*?)\n?```", re.DOTALL)


def clean_json_fence(text: str) -> str:
    """Extract the payload between markdown code fences ANYWHERE in
    the text (M4, reference ``operations/scan.py:69-75``: a payload
    like 'Here is the JSON:\\n```json\\n{...}\\n```' must parse);
    fall back to the stripped text when no fence is present."""
    m = _FENCE_RX.search(text)
    if m:
        return m.group(1).strip()
    return text.strip()


def coerce_resolution(value: Any) -> int:
    """Resolution level: anything not in {0,1,2} becomes 0
    (reference ``core/state.py:25-35``)."""
    try:
        v = int(value)
    except (TypeError, ValueError):
        return 0
    return v if v in (0, 1, 2) else 0


def coerce_page_num(value: Any, fallback: Optional[int] = None) -> Optional[int]:
    """Positive int or the fallback (reference M6 coercion,
    ``operations/scan.py:126-184``)."""
    try:
        v = int(value)
    except (TypeError, ValueError):
        return fallback
    return v if v >= 1 else fallback


def sanitize_headers(raw: Any) -> List[dict]:
    """Keep only header dicts with level/title/page (M14)."""
    if not isinstance(raw, list):
        return []
    out = []
    for h in raw:
        if not isinstance(h, dict):
            continue
        level = coerce_page_num(h.get("level"))
        page = coerce_page_num(h.get("page"))
        title = h.get("title")
        if level is None or page is None or not isinstance(title, str) or not title:
            continue
        out.append({"level": level, "title": title, "page": page})
    return out


def parse_scan_payload(text: str) -> dict:
    """Lenient scan-payload parse (M5): fence-stripped JSON →
    {text, structure{headers}, ocr_registry[]}; ANY parse problem →
    the empty payload, never an exception."""
    empty = {"text": "", "structure": {"headers": []}, "ocr_registry": []}
    try:
        data = json.loads(clean_json_fence(text))
    except (json.JSONDecodeError, TypeError):
        return empty
    if not isinstance(data, dict):
        return empty
    out_text = data.get("text")
    structure = data.get("structure")
    registry = data.get("ocr_registry")
    return {
        "text": out_text if isinstance(out_text, str) else "",
        "structure": {
            "headers": sanitize_headers(
                structure.get("headers") if isinstance(structure, dict) else None
            )
        },
        "ocr_registry": registry if isinstance(registry, list) else [],
    }


def sanitize_registry_batch(batch: pa.Table) -> pa.Table:
    """Registry-load validation (reference ``state.py:158-163,810-812``):
    rows with invalid/absent page_num or empty entity_id are dropped;
    invalid resolution values are coerced to 0."""
    pages = batch.column("page_num").to_pylist()
    ids = batch.column("entity_id").to_pylist()
    resolutions = batch.column("resolution").to_pylist()

    keep_idx, fixed_res = [], []
    for i, (p, eid, res) in enumerate(zip(pages, ids, resolutions)):
        if coerce_page_num(p) is None:
            continue
        if not isinstance(eid, str) or not eid:
            continue
        keep_idx.append(i)
        fixed_res.append(coerce_resolution(res))

    kept = batch.take(pa.array(keep_idx, type=pa.int64()))
    return kept.set_column(
        kept.column_names.index("resolution"),
        "resolution",
        pa.array(fixed_res, type=pa.int64()),
    )
