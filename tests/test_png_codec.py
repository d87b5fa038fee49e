"""Pure-Python PNG codec tests: roundtrip properties, all five scanline
filters, palette expansion, and the real (non-stubbed) mask operators built
on it (A6 bboxes / K11 recolor / resize) vs a numpy reference."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jigsaw_spark.multimodal.png_codec import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    resize_nearest,
)


def _rng_array(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 17),
    w=st.integers(1, 19),
    ch=st.sampled_from([1, 3, 4]),
)
def test_roundtrip_property(seed, h, w, ch):
    a = _rng_array(seed, h, w, ch)
    out = decode_png(encode_png(a))
    assert out.shape == a.shape
    assert np.array_equal(out, a)


def _filter_forward(body: np.ndarray, h: int, stride: int, bpp: int, ftype: int) -> bytes:
    """Reference forward filter (PNG spec §9) to exercise the decoder's
    unfilter paths — the encoder itself only ever emits filter 0."""
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = body[y].astype(np.int32)
        filt = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (row[i] - pred) & 0xFF
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row
    return bytes(out)


def _png_with_filter(a: np.ndarray, ftype: int) -> bytes:
    h, w = a.shape[:2]
    ch = 1 if a.ndim == 2 else a.shape[2]
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    body = a.reshape(h, w * ch)
    raw = _filter_forward(body, h, w * ch, ch, ftype)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3])
def test_all_scanline_filters_decode(ftype, ch):
    a = _rng_array(ftype * 10 + ch, 9, 11, ch)
    out = decode_png(_png_with_filter(a, ftype))
    assert np.array_equal(out, a)


def test_palette_png_expands_to_rgb():
    # 2x3 palette image: indices into a 3-color palette
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    pal = b"\x40\x00\x80" + b"\x00\x40\x40" + b"\xff\xff\x00"
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 3, 3)
    assert tuple(out[0, 0]) == (0x40, 0x00, 0x80)
    assert tuple(out[1, 0]) == (0xFF, 0xFF, 0x00)
    assert tuple(out[0, 2]) == (0xFF, 0xFF, 0x00)


def test_multi_idat_and_unsupported_shapes():
    a = _rng_array(7, 5, 4, 3)
    png = encode_png(a)
    # split the single IDAT into two chunks — decoders must concatenate
    # (find IDAT, split payload)
    pos = png.index(b"IDAT") - 4
    (ln,) = struct.unpack(">I", png[pos : pos + 4])
    payload = png[pos + 8 : pos + 8 + ln]
    half = len(payload) // 2

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    rebuilt = (
        png[:pos]
        + chunk(b"IDAT", payload[:half])
        + chunk(b"IDAT", payload[half:])
        + png[pos + 12 + ln :]
    )
    assert np.array_equal(decode_png(rebuilt), a)
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"garbage")
    # 16-bit depth unsupported
    bad = PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="depth|IDAT"):
        decode_png(bad + chunk(b"IDAT", zlib.compress(b"\x00" * 10)))


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_bbox_extents_match_numpy_reference(seed):
    """mask_to_bboxes kernel arithmetic vs straight numpy (no Spark)."""
    rng = np.random.RandomState(seed)
    arr = np.zeros((10, 12, 3), dtype=np.uint8)
    # paint 1-3 random rectangles in distinct colors
    colors = [(64, 0, 128), (0, 64, 64), (192, 128, 0)]
    for c in colors[: 1 + seed % 3]:
        y0, x0 = rng.randint(0, 8), rng.randint(0, 10)
        arr[y0 : y0 + rng.randint(1, 3), x0 : x0 + rng.randint(1, 3)] = c
    png = encode_png(arr)
    dec = decode_png(png)
    packed = (
        (dec[:, :, 0].astype(np.int32) << 16)
        | (dec[:, :, 1].astype(np.int32) << 8)
        | dec[:, :, 2].astype(np.int32)
    )
    for u in np.unique(packed):
        ys, xs = np.nonzero(packed == u)
        ref_ys, ref_xs = np.nonzero(
            (arr[:, :, 0].astype(np.int32) << 16)
            | (arr[:, :, 1].astype(np.int32) << 8)
            | arr[:, :, 2].astype(np.int32) == u
        )
        assert (ys.min(), ys.max(), xs.min(), xs.max()) == (
            ref_ys.min(),
            ref_ys.max(),
            ref_xs.min(),
            ref_xs.max(),
        )


def test_resize_nearest_preserves_labels():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    arr[0:4, 0:4] = (64, 0, 128)
    small = resize_nearest(arr, 4, 4)
    assert small.shape == (4, 4, 3)
    # only colors that existed before may appear after (no interpolation)
    before = {tuple(p) for p in arr.reshape(-1, 3)}
    after = {tuple(p) for p in small.reshape(-1, 3)}
    assert after <= before
    assert tuple(small[0, 0]) == (64, 0, 128)


def test_recolor_masks_real_png(spark):
    from jigsaw_spark.multimodal.binary_ops import recolor_masks

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[1:3, 1:3] = (64, 0, 128)
    df = spark.createDataFrame(
        [("m1", "mask", "mem://m1", bytearray(encode_png(arr)))],
        "image_id string, kind string, path string, content binary",
    )
    out = recolor_masks(df, {(64, 0, 128): (0, 255, 0)}, fake=False).collect()
    assert out[0]["recolored"] is True
    dec = decode_png(bytes(out[0]["content"]))
    assert tuple(dec[1, 1]) == (0, 255, 0)
    assert tuple(dec[0, 0]) == (0, 0, 0)
    # mapping that touches nothing → original bytes, flag False
    out2 = recolor_masks(df, {(9, 9, 9): (1, 1, 1)}, fake=False).collect()
    assert out2[0]["recolored"] is False
    assert bytes(out2[0]["content"]) == bytes(encode_png(arr))


def test_resize_images_real_png(spark):
    from jigsaw_spark.multimodal.binary_ops import resize_images

    arr = np.zeros((8, 6, 3), dtype=np.uint8)
    arr[:, 3:] = (10, 20, 30)
    df = spark.createDataFrame(
        [("i1", bytearray(encode_png(arr)))], "image_id string, content binary"
    )
    out = resize_images(df, width=3, height=4, fake=False).collect()
    dec = decode_png(bytes(out[0]["resized"]))
    assert dec.shape == (4, 3, 3)
    assert tuple(dec[0, 2]) == (10, 20, 30)
    assert tuple(dec[0, 0]) == (0, 0, 0)


def test_jpeg_dimensions_sof_walk():
    import struct

    from jigsaw_spark.multimodal.png_codec import jpeg_dimensions

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # SOI + APP0(JFIF) + DQT + SOF0(h=480, w=640) + SOS
    jpeg = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes(65))
        + seg(0xC0, b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + bytes(9))
        + seg(0xDA, b"\x03" + bytes(6))
    )
    assert jpeg_dimensions(jpeg) == (640, 480)
    # progressive SOF2 also carries dims
    jpeg2 = b"\xff\xd8" + seg(0xC2, b"\x08" + struct.pack(">HH", 7, 9) + b"\x01" + bytes(3))
    assert jpeg_dimensions(jpeg2) == (9, 7)
    # DHT (C4) must NOT be mistaken for a SOF
    jpeg3 = (
        b"\xff\xd8"
        + seg(0xC4, bytes(18))
        + seg(0xC0, b"\x08" + struct.pack(">HH", 3, 5) + b"\x01" + bytes(3))
    )
    assert jpeg_dimensions(jpeg3) == (5, 3)
    assert jpeg_dimensions(b"\x89PNG") is None
    assert jpeg_dimensions(b"\xff\xd8\xff") is None  # truncated
    # SOS before any SOF → give up cleanly, never scan entropy data
    assert jpeg_dimensions(b"\xff\xd8" + seg(0xDA, b"\x01\x00\x00")) is None
