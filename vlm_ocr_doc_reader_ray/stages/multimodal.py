"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the media itself is an
opaque ``large_binary`` column; decode / feature-extraction stages are
actor-pool ``map_batches`` with SMALL batch sizes (payload × batch ×
concurrency must fit worker heap). The actual codecs are not
available in this environment, so the decode body is either a
deterministic header parse (our synthetic container) or an explicit
``NotImplementedError`` — the Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested.

Synthetic container (``FIMG1``): magic + big-endian u32 width,
height + raw payload bytes. Width/height are pure functions of
``doc_id`` so the DuckDB oracle can verify the decode output.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

MAGIC = b"FIMG1"


def fake_image(doc_id: int, text: str) -> bytes:
    """Deterministic synthetic media payload for documents rows."""
    width = 640 + (doc_id % 5) * 160
    height = 360 + (doc_id % 7) * 120
    return (
        MAGIC
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + text.encode("utf-8")
    )


def attach_media(docs: rd.Dataset) -> rd.Dataset:
    """documents rows → + ``media: large_binary`` column."""

    def add(batch: pa.Table) -> pa.Table:
        payloads = [
            fake_image(int(d), t)
            for d, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            )
        ]
        return batch.append_column("media", pa.array(payloads, type=pa.large_binary()))

    return docs.map_batches(add, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage: header parse + payload accounting.

    ``__init__`` is where a real build would load the codec / model
    weights once per actor; ``__call__`` handles one small batch.
    A malformed payload yields ``decode_status='failed'`` — failure is
    data, consistent with the extraction stage contract.
    """

    def __init__(self) -> None:
        self.magic = MAGIC

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, nbytes, status = [], [], [], []
        for payload in batch.column("media").to_pylist():
            if payload is None or payload[:5] != self.magic or len(payload) < 13:
                widths.append(0)
                heights.append(0)
                nbytes.append(0 if payload is None else len(payload))
                status.append("failed")
                continue
            w = int.from_bytes(payload[5:9], "big")
            h = int.from_bytes(payload[9:13], "big")
            widths.append(w)
            heights.append(h)
            nbytes.append(len(payload) - 13)
            status.append("ok")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(widths, type=pa.int64()),
                "height": pa.array(heights, type=pa.int64()),
                "payload_bytes": pa.array(nbytes, type=pa.int64()),
                "decode_status": pa.array(status, type=pa.string()),
            }
        )


def decode_media(
    ds: rd.Dataset, concurrency: int | None = None, batch_size: int = 64
) -> rd.Dataset:
    """Decode stage: small batches (binary payloads are wide rows).

    ``concurrency=None`` → stateless tasks (default: the stub decoder
    holds no real state). Pin an actor pool when the decoder loads a
    real codec/model — and size it BELOW the cluster CPU count, or the
    read/write task stages starve and the pipeline deadlocks."""
    if concurrency is None:
        return ds.map_batches(
            MediaDecoder(), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """STUB: real pixel decode/resize needs an image codec not present
    in this environment. The stage signature and batch plumbing are
    the production shape; calling it raises ``NotImplementedError``
    (gate it behind a codec import in a real deployment)."""

    def __init__(self, target: tuple[int, int] = (224, 224)) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "pixel decode requires an image codec (PIL/cv2) not available here"
        )
