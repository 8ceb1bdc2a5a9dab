"""Ray-Data-native main-content extraction engine.

A from-scratch re-expression of the capabilities of
``Dieugene/vlm-ocr-doc-reader`` (reference at ``/root/reference``) as a
streaming ``ray.data.Dataset`` pipeline over Common-Crawl-style Parquet:

- deterministic HTML boilerplate stripping (text/link-density block
  classification) replacing the reference's VLM "scan" level,
- PDF-layout parsing (page segmentation + XY-cut reading order) for
  binary payloads,
- a registry of precision-critical entities (reference
  ``core/state.py:45-67``) with pointwise resolve (level 1) and
  N-axis majority-vote verify (level 2, ``core/voting.py:44-89``),
- span-offset bookkeeping so every url yields byte-identical extracted
  text at any parallelism,
- checkpointed, lineage-tracked partitioned Parquet output.

Layout:
    corpus/     deterministic synthetic web corpus (url, warc_ts, html, text, lang)
    extract/    pure single-process extraction core (the oracle)
    stages/     Ray Data map_batches stages / actor pools
    pipelines/  end-to-end Dataset pipelines
    state/      manifest / checkpoint / resume
"""

__version__ = "0.1.0"
