"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the media itself is an
opaque ``large_binary`` column; decode / feature-extraction stages are
actor-pool ``map_batches`` with SMALL batch sizes (payload × batch ×
concurrency must fit worker heap). Two decode tiers:

- the synthetic ``FIMG1``/``FVID1`` containers (header parse /
  byte-offset frame slicing) exercise the plumbing with
  SQL-recomputable outputs;
- ``ImageResizer`` runs a REAL pixel path — pure-stdlib PNG decode →
  bilinear resize → re-encode (``extract/pngcodec.py``; no PIL/cv2 in
  this environment, and none needed for PNG). JPEG/video codecs
  remain out of scope here; a real deployment swaps the codec in the
  actor ``__init__`` without touching the stage shape.

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


VIDEO_MAGIC = b"FVID1"
FRAME_BYTES = 16  # one md5 digest per frame


def fake_video(doc_id: int) -> bytes:
    """Deterministic synthetic video container: magic + u32 frame
    count + fixed-size frames. Frame ``k``'s bytes are
    ``md5(f"{doc_id}:{k}")`` so the DuckDB oracle can recompute the
    sampled frames without any codec."""
    import hashlib

    n_frames = 8 + doc_id % 5
    frames = b"".join(
        hashlib.md5(f"{doc_id}:{k}".encode()).digest() for k in range(n_frames)
    )
    return VIDEO_MAGIC + n_frames.to_bytes(4, "big") + frames


def attach_video(docs: rd.Dataset) -> rd.Dataset:
    """documents rows → + ``video: large_binary`` column."""

    def add(batch: pa.Table) -> pa.Table:
        payloads = [fake_video(int(d)) for d in batch.column("doc_id").to_pylist()]
        return batch.append_column("video", pa.array(payloads, type=pa.large_binary()))

    return docs.map_batches(add, batch_format="pyarrow")


def sample_frames(ds: rd.Dataset, every: int = 2, batch_size: int = 64) -> rd.Dataset:
    """Frame-sampling stage: explode every ``every``-th frame by REAL
    byte-offset slicing of the container (the flat-map shape a real
    video pipeline uses — one output row per sampled frame, small
    batches because payloads are wide).

    Output: (doc_id, frame_idx, frame_md5) where frame_md5 is the hex
    of the frame's bytes — byte-identical to the oracle's
    ``md5(doc_id || ':' || frame_idx)``."""

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_hex = [], [], []
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(), batch.column("video").to_pylist()
        ):
            if payload is None or payload[:5] != VIDEO_MAGIC:
                continue  # failure is data: undecodable rows drop here
            n_frames = int.from_bytes(payload[5:9], "big")
            body = payload[9:]
            for k in range(0, n_frames, every):
                frame = body[k * FRAME_BYTES: (k + 1) * FRAME_BYTES]
                out_id.append(int(doc_id))
                out_idx.append(k)
                out_hex.append(frame.hex())
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_md5": pa.array(out_hex, type=pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)


class MediaFeaturizer:
    """Actor-pool feature-extraction stage: deterministic 16-bin byte
    histogram (fractions) per payload as ``list<float>`` — the
    batched-model-inference shape (weights would load in ``__init__``)
    with a stand-in featurizer that is real, vectorized and
    process-stable. Verified by pytest (no SQL: blob byte iteration
    is not SQL-expressible), like any model-scoring op."""

    def __init__(self, media_col: str = "media", bins: int = 16) -> None:
        self.media_col = media_col
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        feats = []
        shift = 8 - (self.bins - 1).bit_length()
        for payload in batch.column(self.media_col).to_pylist():
            if not payload:
                feats.append([0.0] * self.bins)
                continue
            arr = np.frombuffer(payload, dtype=np.uint8) >> shift
            hist = np.bincount(arr, minlength=self.bins).astype(np.float64)
            feats.append((hist / len(arr)).tolist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "features": pa.array(feats, type=pa.list_(pa.float64(), self.bins)),
            }
        )


def png_pixels(doc_id: int) -> "np.ndarray":  # noqa: F821
    """Deterministic grayscale test image for ``doc_id``:
    ``pixel(y,x) = (3x + 7y + doc_id) mod 256`` at
    ``(16+(doc_id%7)*4) × (16+(doc_id%5)*8)`` — simple enough that the
    DuckDB oracle recomputes the pixel sum symbolically."""
    import numpy as np

    w = 16 + (doc_id % 5) * 8
    h = 16 + (doc_id % 7) * 4
    grid = np.add.outer(7 * np.arange(h, dtype=np.int64),
                        3 * np.arange(w, dtype=np.int64)) + doc_id
    return (grid % 256).astype(np.uint8)


def attach_png(docs: rd.Dataset, corrupt_every: int = 97,
               corrupt_residue: int = 13) -> rd.Dataset:
    """documents rows → + ``media: large_binary`` of REAL PNG bytes
    (pure-stdlib encoder). Docs on the engine-wide corrupt residue get
    a truncated payload — failure is data downstream."""
    from vlm_ocr_doc_reader_ray.extract.pngcodec import encode_png

    def add(batch: pa.Table) -> pa.Table:
        payloads = []
        for d in batch.column("doc_id").to_pylist():
            png = encode_png(png_pixels(int(d)))
            if int(d) % corrupt_every == corrupt_residue:
                png = png[: len(png) // 2]  # truncated mid-chunk
            payloads.append(png)
        return batch.append_column(
            "media", pa.array(payloads, type=pa.large_binary())
        )

    return docs.map_batches(add, batch_format="pyarrow")


class ImageResizer:
    """Real decode → bilinear resize → re-encode over PNG payloads
    (pure-stdlib codec, ``extract/pngcodec.py``) — the page-raster
    preprocessing shape of the reference's renderer
    (`preprocessing/renderer.py:35-96`), run as a small-batch stage.

    Emits input dims + pixel sum (oracle-checkable), output dims +
    pixel sum, and the resized PNG; undecodable payloads yield
    ``resize_status='failed'`` with zeroed metrics. ``keep_cols``
    pass through from the input batch unchanged (for composed
    pipelines that carry keys/metadata alongside the media)."""

    def __init__(self, target: tuple[int, int] = (32, 32),
                 media_col: str = "media",
                 keep_cols: "list[str] | None" = None) -> None:
        # a real deployment loads its codec here, once per actor
        from vlm_ocr_doc_reader_ray.extract import pngcodec

        self.codec = pngcodec
        self.target = target
        self.media_col = media_col
        self.keep_cols = list(keep_cols or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        in_w, in_h, in_sum = [], [], []
        out_sum, resized, status = [], [], []
        for payload in batch.column(self.media_col).to_pylist():
            try:
                arr = self.codec.decode_png(payload)
                small = self.codec.resize_bilinear(arr, self.target)
                h, w = arr.shape[:2]
                in_w.append(w)
                in_h.append(h)
                in_sum.append(int(arr.astype(np.int64).sum()))
                out_sum.append(int(small.astype(np.int64).sum()))
                resized.append(self.codec.encode_png(small))
                status.append("ok")
            except Exception:  # zlib.error / ValueError / truncation
                in_w.append(0)
                in_h.append(0)
                in_sum.append(0)
                out_sum.append(0)
                resized.append(b"")
                status.append("failed")
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "in_w": pa.array(in_w, type=pa.int64()),
                "in_h": pa.array(in_h, type=pa.int64()),
                "in_sum": pa.array(in_sum, type=pa.int64()),
                "out_w": pa.array(
                    [self.target[1] if s == "ok" else 0 for s in status],
                    type=pa.int64(),
                ),
                "out_h": pa.array(
                    [self.target[0] if s == "ok" else 0 for s in status],
                    type=pa.int64(),
                ),
                "out_sum": pa.array(out_sum, type=pa.int64()),
                "resized": pa.array(resized, type=pa.large_binary()),
                "resize_status": pa.array(status, type=pa.string()),
            }
        )
        for c in self.keep_cols:
            out = out.append_column(c, batch.column(c))
        return out


def resize_media(
    ds: rd.Dataset,
    target: tuple[int, int] = (32, 32),
    concurrency: int | None = None,
    batch_size: int = 64,
    keep_cols: "list[str] | None" = None,
) -> rd.Dataset:
    """Decode+resize stage over PNG media. Stateless tasks by default;
    pass ``concurrency`` for an actor pool sized BELOW the cluster CPU
    count (pool-takes-all starves the read stage)."""
    if concurrency is None:
        return ds.map_batches(
            ImageResizer(target, keep_cols=keep_cols),
            batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target": target, "keep_cols": keep_cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImagePHasher:
    """Perceptual difference-hash (dHash) over PNG payloads — the
    standard image near-dup fingerprint (Krawetz's dHash: downsample
    to a 9×8 luminance grid, emit one bit per horizontal neighbor
    pair "right pixel brighter than left"). Brightness-offset
    invariant by construction (a constant shift cancels in the
    comparison), which is exactly why training-data pipelines prefer
    it over byte hashes for scraped-image dedup.

    Integer-exact contract so the DuckDB oracle can replay it from
    the symbolic corpus image: the downsample is NEAREST-NEIGHBOR at
    floor-divided grid positions ``x_j = (j·w)//9``, ``y_i =
    (i·h)//8`` (NOT area averaging — averaging would be float), and
    the 64 bits are split into two int64 columns ``phash_hi`` (bits
    32..63) / ``phash_lo`` (bits 0..31) so no value ever touches the
    int64 sign bit on either side of the compare.

    Undecodable payloads yield ``phash_status='failed'`` with
    sentinel hashes -1 — failure is data, per the stage contract.
    Reference analog: none — beyond-reference multimodal op; the
    image-side counterpart of the text minhash/simhash family.
    """

    def __init__(self, media_col: str = "media") -> None:
        # a real deployment loads its codec here, once per actor
        import numpy as np

        from vlm_ocr_doc_reader_ray.extract import pngcodec

        self.codec = pngcodec
        self.media_col = media_col
        self._w32 = (1 << np.arange(32, dtype=np.int64))

    def _dhash(self, arr) -> tuple[int, int]:
        import numpy as np

        if arr.ndim == 3:  # channel floor-mean → luminance
            arr = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
        h, w = arr.shape
        xs = (np.arange(9, dtype=np.int64) * w) // 9
        ys = (np.arange(8, dtype=np.int64) * h) // 8
        grid = arr[np.ix_(ys, xs)].astype(np.int64)
        bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)  # k = i*8+j
        lo = int(bits[:32].astype(np.int64) @ self._w32)
        hi = int(bits[32:].astype(np.int64) @ self._w32)
        return hi, lo

    def __call__(self, batch: pa.Table) -> pa.Table:
        his, los, status = [], [], []
        for payload in batch.column(self.media_col).to_pylist():
            try:
                hi, lo = self._dhash(self.codec.decode_png(payload))
                his.append(hi)
                los.append(lo)
                status.append("ok")
            except Exception:  # zlib.error / ValueError / truncation
                his.append(-1)
                los.append(-1)
                status.append("failed")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "phash_hi": pa.array(his, type=pa.int64()),
                "phash_lo": pa.array(los, type=pa.int64()),
                "phash_status": pa.array(status, type=pa.string()),
            }
        )


def phash_media(
    ds: rd.Dataset,
    media_col: str = "media",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> rd.Dataset:
    """dHash fingerprint stage over PNG media → (doc_id, phash_hi,
    phash_lo, phash_status). Stateless tasks by default; pass
    ``concurrency`` for an actor pool sized below the cluster CPU
    count (pool-takes-all starves the read stage)."""
    if concurrency is None:
        return ds.map_batches(
            ImagePHasher(media_col), batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        ImagePHasher,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def phash_dedup(
    ds: rd.Dataset,
    media_col: str = "media",
    batch_size: int = 64,
) -> rd.Dataset:
    """Perceptual image dedup: dHash every payload, then count docs
    sharing each 64-bit hash → (doc_id, phash_hi, phash_lo,
    phash_status, n_same); failed decodes keep sentinel hashes and
    n_same = 0.

    Scale shape: after the decode stage only (doc_id, hash) pairs
    (~24 B/doc) remain — ONE hash-partitioned shuffle of those
    co-locates equal hashes, and the per-partition group count is a
    vectorized pandas transform (the exact-dedup discipline; never a
    corpus-payload shuffle, never a self-join). Failed decodes all
    share the (-1, -1) sentinel — a 1-in-97 hot key at corpus scale —
    so they are SALTED into singleton groups by doc_id before the
    shuffle (their n_same is 0 by contract, group size irrelevant).
    """
    import numpy as np
    import pandas as pd

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    hashed = phash_media(ds, media_col=media_col, batch_size=batch_size)

    def salt_failed(b: pd.DataFrame) -> pd.DataFrame:
        # shuffle key: the hash for ok rows, (doc_id, -1) for failed
        # ones — real phash_lo is never negative, so no collision
        ok = (b["phash_status"] == "ok").to_numpy()
        b = b.copy()
        b["k_hi"] = np.where(
            ok, b["phash_hi"].to_numpy(np.int64), b["doc_id"].to_numpy(np.int64)
        )
        b["k_lo"] = np.where(ok, b["phash_lo"].to_numpy(np.int64), -1)
        return b

    def count_same(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["n_same"] = (
            g.groupby(["k_hi", "k_lo"])["doc_id"]
            .transform("size")
            .astype("int64")
        )
        g.loc[g["phash_status"] != "ok", "n_same"] = np.int64(0)
        return g.drop(columns=["k_hi", "k_lo"])

    return partitioned_apply(
        hashed.map_batches(salt_failed, batch_format="pandas"),
        ["k_hi", "k_lo"],
        count_same,
    )


def wav_samples(doc_id: int) -> tuple["np.ndarray", int]:  # noqa: F821
    """Deterministic int16 test signal for ``doc_id``:
    ``s[k] = ((31·doc_id + 17k) mod 4001) - 2000`` over
    ``800 + (doc_id % 7)·160`` samples at ``8000 + (doc_id % 3)·4000``
    Hz — integer-exact so the DuckDB oracle recomputes every audio
    feature symbolically (the audio twin of :func:`png_pixels`)."""
    import numpy as np

    n = 800 + (doc_id % 7) * 160
    k = np.arange(n, dtype=np.int64)
    v = (31 * doc_id + 17 * k) % 4001 - 2000
    return v.astype(np.int16), 8000 + (doc_id % 3) * 4000


def attach_wav(docs: rd.Dataset, corrupt_every: int = 97,
               corrupt_residue: int = 13) -> rd.Dataset:
    """documents rows → + ``media: large_binary`` of REAL WAV bytes
    (pure-stdlib RIFF/PCM encoder). Docs on the engine-wide corrupt
    residue get a truncated payload — failure is data downstream."""
    from vlm_ocr_doc_reader_ray.extract.wavcodec import encode_wav

    def add(batch: pa.Table) -> pa.Table:
        payloads = []
        for d in batch.column("doc_id").to_pylist():
            wav = encode_wav(*wav_samples(int(d)))
            if int(d) % corrupt_every == corrupt_residue:
                wav = wav[: len(wav) // 2]  # truncated mid-chunk
            payloads.append(wav)
        return batch.append_column(
            "media", pa.array(payloads, type=pa.large_binary())
        )

    return docs.map_batches(add, batch_format="pyarrow")


class AudioFeaturizer:
    """Real WAV decode → integer-exact signal features, run as a
    small-batch stage (the audio counterpart of :class:`ImageResizer`;
    a real deployment swaps in its audio codec / feature model in
    ``__init__`` without touching the stage shape).

    Features are all integer arithmetic so the DuckDB oracle can
    replay them from the symbolic signal: sample count, sample rate,
    floor-division duration in ms, peak |amplitude|, Σ|amplitude|
    (the exact-energy proxy — RMS would be float), and the
    zero-crossing count (consecutive pairs whose signs differ,
    negative vs non-negative). Undecodable payloads yield
    ``audio_status='failed'`` with zeroed features.
    """

    def __init__(self, media_col: str = "media") -> None:
        # a real deployment loads its codec here, once per actor
        from vlm_ocr_doc_reader_ray.extract import wavcodec

        self.codec = wavcodec
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rates, counts, durs, peaks, sums, crossings, status = (
            [], [], [], [], [], [], [],
        )
        for payload in batch.column(self.media_col).to_pylist():
            try:
                s, rate = self.codec.decode_wav(payload)
                v = s.astype(np.int64)
                a = np.abs(v)
                rates.append(rate)
                counts.append(len(v))
                durs.append((len(v) * 1000) // rate)
                peaks.append(int(a.max()) if len(v) else 0)
                sums.append(int(a.sum()))
                crossings.append(
                    int(np.count_nonzero((v[:-1] < 0) != (v[1:] < 0)))
                )
                status.append("ok")
            except Exception:  # ValueError / struct truncation
                rates.append(0)
                counts.append(0)
                durs.append(0)
                peaks.append(0)
                sums.append(0)
                crossings.append(0)
                status.append("failed")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sample_rate": pa.array(rates, type=pa.int64()),
                "n_samples": pa.array(counts, type=pa.int64()),
                "duration_ms": pa.array(durs, type=pa.int64()),
                "peak_abs": pa.array(peaks, type=pa.int64()),
                "sum_abs": pa.array(sums, type=pa.int64()),
                "n_zero_cross": pa.array(crossings, type=pa.int64()),
                "audio_status": pa.array(status, type=pa.string()),
            }
        )


def audio_features(
    ds: rd.Dataset,
    media_col: str = "media",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> rd.Dataset:
    """WAV decode + feature stage → (doc_id, sample_rate, n_samples,
    duration_ms, peak_abs, sum_abs, n_zero_cross, audio_status).
    Stateless tasks by default; pass ``concurrency`` for an actor pool
    sized below the cluster CPU count."""
    if concurrency is None:
        return ds.map_batches(
            AudioFeaturizer(media_col), batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_chunks(
    ds: rd.Dataset,
    chunk: int = 256,
    media_col: str = "media",
    batch_size: int = 64,
) -> rd.Dataset:
    """Fixed-window audio segmentation — the flat-map shape a speech
    training pipeline uses to cut long recordings into model-sized
    segments: one output row per non-overlapping ``chunk``-sample
    window (the tail window may be short), with integer-exact
    per-window features so the DuckDB oracle replays them from the
    symbolic signal.

    Output: (doc_id, chunk_idx, start, n_samples, sum_abs, peak_abs).
    Undecodable payloads contribute no rows (failure is data at the
    feature stage — :func:`audio_features` — not here; same contract
    as :func:`sample_frames`).

    Per-batch work is vectorized: windows reduce via
    ``np.add.reduceat`` / ``np.maximum.reduceat`` over the decoded
    signal — no per-sample Python loop."""
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    from vlm_ocr_doc_reader_ray.extract.wavcodec import decode_wav

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, idxs, starts, ns, sums, peaks = [], [], [], [], [], []
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column(media_col).to_pylist(),
        ):
            try:
                s, _rate = decode_wav(payload)
            except Exception:
                continue  # undecodable rows drop here
            if not len(s):
                continue
            a = np.abs(s.astype(np.int64))
            st = np.arange(0, len(s), chunk, dtype=np.int64)
            ids.extend([int(doc_id)] * len(st))
            idxs.extend(range(len(st)))
            starts.extend(st.tolist())
            ends = np.minimum(st + chunk, len(s))
            ns.extend((ends - st).tolist())
            sums.extend(np.add.reduceat(a, st).tolist())
            peaks.extend(np.maximum.reduceat(a, st).tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "chunk_idx": pa.array(idxs, type=pa.int64()),
                "start": pa.array(starts, type=pa.int64()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "sum_abs": pa.array(sums, type=pa.int64()),
                "peak_abs": pa.array(peaks, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)


def phash_keep_canonical(
    ds: rd.Dataset,
    media_col: str = "media",
    batch_size: int = 64,
) -> rd.Dataset:
    """Perceptual keep-one: dHash every payload and keep the MIN
    doc_id per 64-bit hash → (doc_id, phash_hi, phash_lo, n_same)
    with ``n_same`` the size of the perceptual-duplicate class the
    winner represents. Failed decodes are excluded (they have no
    perceptual identity; :func:`audio_features`-style failure
    accounting lives in :func:`phash_dedup`).

    Scale shape: one decode pass collapses to (doc_id, hash) pairs;
    one hash-partitioned shuffle co-locates equal hashes; winner
    selection + class count is one vectorized groupby-idxmin per
    partition. The output is ONLY winner keys — the intended
    composition re-fetches surviving payloads by key (payloads are
    never shuffled)."""
    import pandas as pd
    import pyarrow.compute as pc

    from vlm_ocr_doc_reader_ray.stages.aggregates import partitioned_apply

    hashed = phash_media(ds, media_col=media_col, batch_size=batch_size)

    def only_ok(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(b.column("phash_status"), "ok")
        ).drop_columns(["phash_status"])

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["phash_hi", "phash_lo"], sort=False)
            .agg(doc_id=("doc_id", "min"), n_same=("doc_id", "size"))
            .reset_index()
        )
        return agg[["doc_id", "phash_hi", "phash_lo", "n_same"]].astype(
            {"n_same": "int64"}
        )

    return partitioned_apply(
        hashed.map_batches(only_ok, batch_format="pyarrow"),
        ["phash_hi", "phash_lo"],
        keep_min,
    )
