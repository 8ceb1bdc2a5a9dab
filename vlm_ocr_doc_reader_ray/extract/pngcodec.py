"""Pure-stdlib PNG codec (zlib + numpy) + bilinear resize.

The sandbox has no PIL/cv2, but PNG needs nothing beyond ``zlib`` and
vectorized byte math — so the multimodal resize stage can run a REAL
decode → resize → encode path instead of a stub (reference parity:
the VLM reader's page-image preprocessing, `preprocessing/renderer.py`
in Dieugene/vlm-ocr-doc-reader, resizes page rasters before upload).

Scope (asserted, not silently wrong): 8-bit depth, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlacing — the
format every standard encoder emits for photographic/synthetic
payloads. Decode handles all five scanline filters: None/Sub/Up are
vectorized (Sub via per-lane uint8 cumsum), Average/Paeth fall back
to a per-pixel loop (our encoder never emits them; foreign PNGs may).

Everything here is pure and Ray-free, like the rest of ``extract/``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 array (h,w) gray / (h,w,3) RGB / (h,w,4) RGBA → PNG bytes
    (filter 0 on every scanline)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, h, w = 0, arr.shape[0], arr.shape[1]
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
        h, w = arr.shape[:2]
        flat = arr.reshape(h, -1)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # prepend the filter-0 byte to each scanline, one pass, no loop
    raw = np.empty((h, flat.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = flat
    idat = zlib.compress(raw.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines → (h, stride) reconstructed."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:]
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub: per-lane cumulative sum, mod 256 free on uint8
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            out[y] = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = line + prior
        elif ftype == 3:  # Average (sequential in x)
            rec = out[y]
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (sequential in x)
            rec = out[y]
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h,w) or (h,w,channels)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} interlace={interlace}); "
            "codec scope is 8-bit non-interlaced"
        )
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = w * ch
    plain = zlib.decompress(b"".join(idat))
    if len(plain) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    raw = np.frombuffer(plain, dtype=np.uint8).reshape(h, stride + 1)
    out = _unfilter(raw, h, stride, ch)
    return out if ch == 1 else out.reshape(h, w, ch)


def resize_bilinear(arr: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Vectorized bilinear resample (pixel-center convention
    ``src = (dst + 0.5) * scale - 0.5``, edges clamped, float64 math,
    round-half-up back to uint8) — deterministic across platforms."""
    oh, ow = out_hw
    h, w = arr.shape[:2]
    a = arr if arr.ndim == 3 else arr[:, :, None]
    ys = (np.arange(oh, dtype=np.float64) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow, dtype=np.float64) + 0.5) * (w / ow) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = a.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.floor(out + 0.5).astype(np.uint8)
    return out[:, :, 0] if arr.ndim == 2 else out
