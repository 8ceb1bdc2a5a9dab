"""Pure, single-process extraction core.

Every function in this subpackage is deterministic and Ray-free: this
is simultaneously the per-row kernel executed inside ``map_batches``
stages and the golden oracle the distributed pipeline is checked
against byte-for-byte (``tests/test_pipeline_identity.py``).
"""

from vlm_ocr_doc_reader_ray.extract.document import ExtractResult, extract_document
from vlm_ocr_doc_reader_ray.extract.registry import (
    RegistryEntry,
    build_registry,
    process_document,
    resolve_entry,
    verify_entry,
)
from vlm_ocr_doc_reader_ray.extract.voting import (
    NO_DATA_KEY,
    Sample,
    majority_vote,
    normalize_for_vote,
    normalize_ocr_digits,
)

__all__ = [
    "ExtractResult",
    "extract_document",
    "RegistryEntry",
    "build_registry",
    "process_document",
    "resolve_entry",
    "verify_entry",
    "NO_DATA_KEY",
    "Sample",
    "majority_vote",
    "normalize_for_vote",
    "normalize_ocr_digits",
]
