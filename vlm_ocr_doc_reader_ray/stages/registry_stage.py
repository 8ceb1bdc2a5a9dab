"""Registry-table stages: upsert, pending filter, grouped verify.

The in-pipeline path resolves/verifies entities while they are still
co-partitioned with their document (no shuffle — SURVEY §2.4 J1).
These stages cover the OTHER reference lifecycle: a registry table
re-read from a checkpoint, where entities must be re-joined to their
documents and vote aggregation really is a distributed groupby.

- ``upsert_registry``: last-write-wins by ``(url, entity_id)`` with a
  deterministic version order — the reference's
  ``upsert_ocr_entries`` (``core/state.py:795-822``) as a
  hash-partitioned group-reduce; empty ids dropped
  (``state.py:810-812``).
- ``pending_entities``: ``resolution < level`` filter — the resume
  primitive (``core/state.py:824-840``).
- ``verify_grouped``: N-axis fan-out × union × ``groupby(url,
  entity_id)`` majority vote. The axis index is an explicit column
  and votes are sorted by it inside the group fn, so the tie-break is
  data-driven — never arrival order (SURVEY §2.5 G3 ordering
  requirement).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import ray.data as rd

from vlm_ocr_doc_reader_ray.extract.registry import _window_extract, RegistryEntry
from vlm_ocr_doc_reader_ray.extract.voting import majority_vote


def upsert_registry(registry: rd.Dataset, version_col: str = "resolution") -> rd.Dataset:
    """Keep the highest-``version_col`` row per (url, entity_id);
    ties broken by the later span_start (stable, data-driven).

    One hash-partitioned shuffle; keep-last is a single vectorized
    sort + drop_duplicates per partition (no per-key dispatch)."""

    def keep_last_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([version_col, "span_start"], ascending=[True, True])
        return g.drop_duplicates(["url", "entity_id"], keep="last")

    def drop_empty(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["entity_id"].astype(str) != ""]

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    cleaned = registry.map_batches(drop_empty, batch_format="pandas")
    return partitioned_apply(cleaned, ["url", "entity_id"], keep_last_part)


def pending_entities(registry: rd.Dataset, below_resolution: int = 1) -> rd.Dataset:
    """The resume primitive: rows still awaiting work."""
    import pyarrow.compute as pc

    return registry.map_batches(
        lambda t: t.filter(pc.less(t.column("resolution"), below_resolution)),
        batch_format="pyarrow",
    )


_REG_COLS = [
    "url", "entity_id", "page_num", "kind", "prompt", "resolution",
    "value", "context", "verified", "confidence", "span_start",
    "span_end", "status",
]


def resolve_pending(
    registry: rd.Dataset,
    extracted: rd.Dataset,
    pages: Sequence[int] | None = None,
    chunk_size: int = 5,
    radius: int = 40,
) -> rd.Dataset:
    """Entity-granular resume: re-resolve ONLY ``resolution < 1`` rows
    of a saved registry, then upsert them over the original.

    The reference lifecycle (``core/reader.py:266-276``): load pending
    entities, optional page filter, chunked resolve
    (``chunked_resolve`` keeps the G2/J2/J3 alignment contract),
    state upsert. Here the registry is a Parquet table: pending rows
    re-join their document text with one hash join on url, each url
    group resolves inside a hash partition (no per-key Ray dispatch),
    and ``upsert_registry`` merges winners by (url, entity_id) with
    resolution as the version — already-resolved rows are never
    touched or re-processed."""
    import numpy as np

    from vlm_ocr_doc_reader_ray.extract.registry import chunked_resolve
    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply
    from vlm_ocr_doc_reader_ray.stages.relational import native_hash_join

    pend = pending_entities(registry, below_resolution=1)
    if pages is not None:
        import pyarrow.compute as pc

        page_arr = pa.array(sorted(pages), type=pa.int64())
        pend = pend.map_batches(
            lambda t: t.filter(pc.is_in(t.column("page_num"), page_arr)),
            batch_format="pyarrow",
        )

    # empty pending set: nothing to do (and empty blocks would lose
    # their schema inside the join) — the registry IS the result
    if pend.count() == 0:
        return registry

    joined = native_hash_join(
        pend, extracted.select_columns(["url", "extracted_text"]), "url", "url"
    )

    def _cell(v):
        return None if (v is None or (isinstance(v, float) and np.isnan(v))) else v

    def resolve_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for url, grp in g.groupby("url", sort=False):
            text = _cell(grp["extracted_text"].iloc[0]) or ""
            entries = [
                RegistryEntry(
                    entity_id=eid, page_num=int(pn), kind=kind, prompt=prompt,
                    resolution=int(res), value=_cell(val), context=_cell(ctx),
                    verified=bool(ver), confidence=_cell(conf),
                    span_start=int(ss), span_end=int(se), status=st,
                )
                for eid, pn, kind, prompt, res, val, ctx, ver, conf, ss, se, st in zip(
                    grp["entity_id"], grp["page_num"], grp["kind"], grp["prompt"],
                    grp["resolution"], grp["value"], grp["context"], grp["verified"],
                    grp["confidence"], grp["span_start"], grp["span_end"], grp["status"],
                )
            ]
            for e in chunked_resolve(entries, text, chunk_size, radius):
                rows.append(
                    (url, e.entity_id, e.page_num, e.kind, e.prompt, e.resolution,
                     e.value, e.context, e.verified, e.confidence, e.span_start,
                     e.span_end, e.status)
                )
        return pd.DataFrame(rows, columns=_REG_COLS).astype(
            {"page_num": "int64", "resolution": "int64", "verified": "bool",
             "span_start": "int64", "span_end": "int64"}
        ) if rows else pd.DataFrame(
            {c: pd.Series([], dtype="object") for c in _REG_COLS}
        ).astype(
            {"page_num": "int64", "resolution": "int64", "verified": "bool",
             "span_start": "int64", "span_end": "int64"}
        )

    resolved = partitioned_apply(joined, ["url"], resolve_part)
    return upsert_registry(registry.union(resolved.select_columns(_REG_COLS)))


def page_resolution(registry: rd.Dataset) -> rd.Dataset:
    """G5 (``core/reader.py:391-408,520-526``): per-(url, page)
    resolution status as a grouped boolean OR over entity outcomes —
    'verified' if any entity verified, else 'resolved' if any resolved
    ok, else 'none'. Pre-aggregated per batch before the shuffle."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "url": batch.column("url"),
                "page_num": batch.column("page_num"),
                "n_verified": pc.cast(batch.column("verified"), pa.int64()),
                "n_ok": pc.cast(pc.equal(batch.column("status"), "ok"), pa.int64()),
            }
        )
        return (
            t.group_by(["url", "page_num"])
            .aggregate([("n_verified", "sum"), ("n_ok", "sum")])
            .rename_columns(["url", "page_num", "n_verified", "n_ok"])
        )

    partials = registry.map_batches(partial, batch_format="pyarrow")
    summed = partials.groupby(["url", "page_num"]).aggregate(
        Sum("n_verified", alias_name="n_verified"),
        Sum("n_ok", alias_name="n_ok"),
    )

    def status(batch: pa.Table) -> pa.Table:
        verified = pc.greater(batch.column("n_verified"), 0)
        ok = pc.greater(batch.column("n_ok"), 0)
        st = pc.if_else(
            verified,
            pa.scalar("verified"),
            pc.if_else(ok, pa.scalar("resolved"), pa.scalar("none")),
        )
        return pa.table(
            {
                "url": batch.column("url"),
                "page_num": batch.column("page_num"),
                "status": st,
            }
        )

    return summed.map_batches(status, batch_format="pyarrow")


def phone_digits(registry: rd.Dataset) -> rd.Dataset:
    """M9 (``utils/normalization.py:6-72``) vectorized over registry
    phone values: OCR-digit normalization as a batch stage."""
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.extract.voting import normalize_ocr_digits

    def norm(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("kind"), "phone"))
        values = batch.column("value").to_pylist()
        return pa.table(
            {
                "url": batch.column("url"),
                "value": batch.column("value"),
                "digits": pa.array(
                    [normalize_ocr_digits(v) for v in values], type=pa.string()
                ),
            }
        )

    return registry.map_batches(norm, batch_format="pyarrow")


def verify_grouped(
    registry: rd.Dataset,
    extracted: rd.Dataset,
    axes: Sequence[int] = (1, 3, 5),
) -> rd.Dataset:
    """Checkpoint-path verify: re-join registry rows to their document
    text (hash-partitioned join on url — the J1 join of SURVEY §2.4
    when pipelining is not available), then vote each row inside
    ``map_batches``.

    The vote itself is per-row string work (irreducible), but there is
    no per-key Ray dispatch and no ``iterrows``: the join moves each
    document text once, and the batch kernel walks plain column
    arrays. One sample per axis, ordered by axis index (the tie-break
    column of G3) — identical at any partitioning.

    LEFT join contract: a registry row whose url has no row in
    ``extracted`` (caller passed a filtered/partial extraction) is
    KEPT and voted against empty text — 0/n confidence, original
    value — matching the reference's behavior when a page read fails
    (``core/reader.py:430-447``), never silently dropped."""
    from vlm_ocr_doc_reader_ray.stages.relational import native_hash_join

    ex = extracted.select_columns(["url", "extracted_text"])
    joined = native_hash_join(registry, ex, "url", "url", join_type="left_outer")
    axis_list = sorted(axes)

    def vote_batch(batch: pd.DataFrame) -> pd.DataFrame:
        out_url, out_eid, out_kind = [], [], []
        out_value, out_conf, out_ver, out_res = [], [], [], []
        for url, eid, page_num, kind, prompt, resolution, value, context, \
                verified, confidence, span_start, span_end, status, text in zip(
            batch["url"], batch["entity_id"], batch["page_num"], batch["kind"],
            batch["prompt"], batch["resolution"], batch["value"], batch["context"],
            batch["verified"], batch["confidence"], batch["span_start"],
            batch["span_end"], batch["status"], batch["extracted_text"],
        ):
            entry = RegistryEntry(
                entity_id=eid, page_num=int(page_num), kind=kind, prompt=prompt,
                resolution=int(resolution), value=value, context=context,
                verified=bool(verified), confidence=confidence,
                span_start=int(span_start), span_end=int(span_end), status=status,
            )
            if not isinstance(text, str):  # left-join null (None/NaN)
                text = ""
            samples = [_window_extract(entry, text, 40 * a) for a in axis_list]
            v = majority_vote(samples)
            out_url.append(url)
            out_eid.append(eid)
            out_kind.append(kind)
            if v.confidence.startswith("0/"):
                out_value.append(value)
                out_conf.append(confidence)
                out_ver.append(bool(verified))
                out_res.append(int(resolution))
            else:
                out_value.append(v.value)
                out_conf.append(v.confidence)
                out_ver.append(v.verified)
                out_res.append(2)
        return pd.DataFrame(
            {
                "url": pd.Series(out_url, dtype="object"),
                "entity_id": pd.Series(out_eid, dtype="object"),
                "kind": pd.Series(out_kind, dtype="object"),
                "value": pd.Series(out_value, dtype="object"),
                "confidence": pd.Series(out_conf, dtype="object"),
                "verified": pd.Series(out_ver, dtype="bool"),
                "resolution": pd.Series(out_res, dtype="int64"),
            }
        )

    return joined.map_batches(vote_batch, batch_format="pandas")
