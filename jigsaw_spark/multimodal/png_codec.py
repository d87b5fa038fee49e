"""Pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only).

The reference's masks ARE PNGs (reference: jigsaw/model_utils/base/mask.py:83-103
reads them with cv2.imread), and this container has no cv2/PIL — but PNG is
a public, simple format: zlib-compressed scanlines with 5 per-row predictor
filters. Implementing decode/encode here makes every mask-pixel operator
(A6 tight bboxes, A7 instance boxes, K11 recolor, deeplab grayscale export)
fully real for the reference's own fixture format, with no native deps.

Scope (everything jigsaw's masks need, nothing more):
  - bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA); no interlace. Other shapes raise ValueError naming the gap.
  - decode returns a numpy uint8 array (h, w) for grayscale or (h, w, C);
    palette images are expanded to RGB.
  - encode accepts (h, w) / (h, w, 3) / (h, w, 4) uint8 arrays and writes
    filter-0 scanlines (correctness-first; compression ratio is irrelevant
    for tests and small masks).

Used executor-side inside Arrow kernels — numpy is already a worker dep.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(content: bytes):
    pos = 8
    n = len(content)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline predictor filters (PNG spec §9)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub (left) — sequential in x
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ft == 2:  # Up — vectorized (uint8 add wraps mod 256, as spec'd)
            row += prev
        elif ft == 3:  # Average
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown scanline filter {ft}")
        out[y] = row
        prev = row
    return out


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) gray or (h, w, C); palette → RGB."""
    if content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(content):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"PNG: unsupported depth/compression ({depth},{comp},{filt})")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlace not supported")
    if ctype_id not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {ctype_id}")
    ch = _CHANNELS[ctype_id]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: IDAT size mismatch")
    px = _unfilter(raw, h, stride, ch)
    if ctype_id == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[px.reshape(h, w)]
    if ch == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes (filter 0)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        ctype_id, ch = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        ctype_id, ch = 2, 3
        h, w = a.shape[:2]
    elif a.ndim == 3 and a.shape[2] == 4:
        ctype_id, ch = 6, 4
        h, w = a.shape[:2]
    else:
        raise ValueError(f"encode_png: unsupported array shape {a.shape}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_id, 0, 0, 0)
    body = a.reshape(h, w * ch)
    # filter byte 0 in front of every scanline
    raw = np.empty((h, w * ch + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = body
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the label-preserving choice for masks —
    interpolation would invent label colors that exist nowhere)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[np.ix_(ys, xs)]


# JPEG markers that carry frame dimensions: SOF0..SOF15 minus DHT(C4),
# JPG(C8), DAC(CC). Payload: precision u8, height u16be, width u16be.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_dimensions(content: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG SOF marker — stdlib-only header walk
    (reference parity: the reference learns dims from cv2-decoded pixels,
    `jigsaw/model_utils/base/mask.py:83-103`; the header carries them
    without decoding). Returns None for non-JPEG / truncated input."""
    if len(content) < 4 or content[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:  # desync — not a marker boundary
            return None
        marker = content[pos + 1]
        if marker == 0xFF:  # fill byte padding
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone RST/SOI/EOI/TEM
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                return None
            h, w = struct.unpack(">HH", content[pos + 5 : pos + 9])
            return (w, h)
        if marker == 0xDA:  # SOS — entropy-coded data follows; SOF must precede
            return None
        pos += 2 + seglen
    return None
