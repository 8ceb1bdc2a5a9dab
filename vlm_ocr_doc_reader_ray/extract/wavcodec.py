"""Minimal pure-stdlib WAV (RIFF / PCM) codec.

The audio-modality counterpart of ``pngcodec.py``: this container has
no image/audio libraries, and none are needed for canonical 16-bit
mono PCM WAV — the format is a fixed RIFF header plus raw
little-endian samples. Scope: PCM (format tag 1), mono, 16-bit,
non-extensible ``fmt `` chunk. Anything else raises ``ValueError`` so
the calling stage can record ``failed`` (failure is data).

Reference analog: none — the reference ships no audio path; this
fills the multimodal axis the way ``pngcodec`` fills the image axis.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples + sample rate → canonical 44-byte-header
    RIFF/WAVE/PCM bytes."""
    if samples.ndim != 1:
        raise ValueError("encode_wav expects mono (1-D) samples")
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + (4 + 8 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 sample array, sample rate).

    Walks RIFF chunks; validates the PCM/mono/16-bit scope and that
    the ``data`` chunk body is exactly its declared length (a
    truncated payload raises, it never yields a silently short
    signal)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if typ == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            tag, ch, rate, _byterate, _align, depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1 or ch != 1 or depth != 16:
                raise ValueError(
                    f"unsupported WAV (tag={tag} ch={ch} depth={depth}); "
                    "codec scope is 16-bit mono PCM"
                )
        elif typ == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte length for 16-bit samples")
    return np.frombuffer(pcm, dtype="<i2").astype(np.int16), int(rate)
