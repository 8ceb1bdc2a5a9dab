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
import ray
import ray.data as rd

from vlm_ocr_doc_reader_ray.extract.registry import RECOGNIZERS, _window_extract, RegistryEntry
from vlm_ocr_doc_reader_ray.extract.voting import Sample, majority_vote


def upsert_registry(registry: rd.Dataset, version_col: str = "resolution") -> rd.Dataset:
    """Keep the highest-``version_col`` row per (url, entity_id);
    ties broken by the later span_start (stable, data-driven)."""

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([version_col, "span_start"], ascending=[True, True])
        return g.tail(1)

    def drop_empty(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["entity_id"].astype(str) != ""]

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_group_apply

    cleaned = registry.map_batches(drop_empty, batch_format="pandas")
    return partitioned_group_apply(cleaned, ["url", "entity_id"], keep_last)


def pending_entities(registry: rd.Dataset, below_resolution: int = 1) -> rd.Dataset:
    """The resume primitive: rows still awaiting work."""
    import pyarrow.compute as pc

    return registry.map_batches(
        lambda t: t.filter(pc.less(t.column("resolution"), below_resolution)),
        batch_format="pyarrow",
    )


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
    text, fan out one sample per axis, vote per (url, entity_id).

    The document text lookup is a bucketed co-group (url is the
    partition key on both sides) — the J1 join of SURVEY §2.4 when
    pipelining is not available."""

    ex = extracted.select_columns(["url", "extracted_text"])

    def tag_side_reg(batch: pa.Table) -> pa.Table:
        return batch.append_column("__side", pa.array(["r"] * len(batch)))

    def tag_side_ex(batch: pa.Table) -> pa.Table:
        return batch.append_column("__side", pa.array(["e"] * len(batch)))

    reg_cols = [
        "url", "entity_id", "page_num", "kind", "prompt", "resolution",
        "value", "context", "verified", "confidence", "span_start",
        "span_end", "status",
    ]

    def pad_reg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["extracted_text"] = None
        df["__side"] = "r"
        return df

    def pad_ex(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in reg_cols:
            if c not in df.columns:
                df[c] = None
        df["__side"] = "e"
        return df[reg_cols + ["extracted_text", "__side"]]

    both = registry.map_batches(pad_reg, batch_format="pandas").union(
        ex.map_batches(pad_ex, batch_format="pandas")
    )

    def vote_group(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["__side"] == "e"]["extracted_text"].dropna()
        text = texts.iloc[0] if len(texts) else ""
        rows = g[g["__side"] == "r"]
        out = []
        for _, r in rows.iterrows():
            entry = RegistryEntry(
                entity_id=r["entity_id"], page_num=int(r["page_num"]),
                kind=r["kind"], prompt=r["prompt"], resolution=int(r["resolution"]),
                value=r["value"], context=r["context"], verified=bool(r["verified"]),
                confidence=r["confidence"], span_start=int(r["span_start"]),
                span_end=int(r["span_end"]), status=r["status"],
            )
            # one sample per axis, ordered by axis index (the tie-break
            # column of G3) — identical at any partitioning
            samples = [_window_extract(entry, text, 40 * a) for a in sorted(axes)]
            v = majority_vote(samples)
            if v.confidence.startswith("0/"):
                out.append(
                    dict(url=r["url"], entity_id=r["entity_id"], kind=r["kind"],
                         value=r["value"], confidence=r["confidence"],
                         verified=bool(r["verified"]), resolution=int(r["resolution"]))
                )
            else:
                out.append(
                    dict(url=r["url"], entity_id=r["entity_id"], kind=r["kind"],
                         value=v.value, confidence=v.confidence,
                         verified=v.verified, resolution=2)
                )
        if not out:
            return pd.DataFrame(
                {c: [] for c in ["url", "entity_id", "kind", "value",
                                 "confidence", "verified", "resolution"]}
            )
        return pd.DataFrame(out)

    return both.groupby("url").map_groups(vote_group, batch_format="pandas")
