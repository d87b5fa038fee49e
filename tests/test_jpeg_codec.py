"""Pure-Python JPEG codec: encode/decode round-trips (lossy →
PSNR-verified), spec-path coverage (4:2:0 decode, restart markers,
progressive 4:4:4 AND 4:2:0 decode parity against baseline, fail-fast on
mislabeled/unsupported SOFn), and the binary_ops integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jigsaw_spark.multimodal.jpeg_codec import (
    DCT_M,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    """JPEG-friendly smooth content: random low-frequency cosine mix."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, ch))
    for c in range(ch):
        for _ in range(3):
            fy, fx = rng.uniform(0, 0.2, 2)
            img[:, :, c] += rng.uniform(30, 80) * np.cos(
                fy * y + fx * x + rng.uniform(0, 6)
            )
    img = img - img.min()
    img = img / img.max() * 255
    out = img.astype(np.uint8)
    return out[:, :, 0] if ch == 1 else out


def test_dct_matrix_is_orthonormal():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    ch=st.sampled_from([1, 3]),
    quality=st.sampled_from([70, 85, 95]),
)
def test_roundtrip_psnr_property(seed, h, w, ch, quality):
    img = _smooth(seed, h, w, ch)
    out = decode_jpeg(encode_jpeg(img, quality))
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    # smooth content at q>=70 round-trips well above 30 dB
    assert _psnr(img, out) > 30.0


def test_flat_image_is_near_exact():
    img = np.full((24, 24), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 85))
    assert np.abs(out.astype(int) - 128).max() <= 1


def test_odd_dimensions_crop_back():
    img = _smooth(3, 37, 45, 3)
    out = decode_jpeg(encode_jpeg(img, 85))
    assert out.shape == (37, 45, 3)
    assert _psnr(img, out) > 30.0


def test_byte_stuffing_survives_noise():
    # high-entropy content maximizes 0xFF occurrences in the entropy stream
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 48), dtype=np.int64).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == img.shape  # lossy, but must parse cleanly


def test_progressive_parity_with_baseline():
    """Progressive (SOF2) decode must reproduce the baseline decode
    bit-for-bit: both encoders quantize identically, so the only
    difference is the entropy layout (T.81 §G.1.2 — DC first/refine,
    AC first/refine with successive approximation Al=1→0)."""
    from jigsaw_spark.multimodal.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    cases = [
        _smooth(1, 24, 40, 1),                                   # gray smooth
        _smooth(2, 17, 23, 3),                                   # RGB odd dims
        rng.integers(0, 256, (48, 48), dtype=np.int64).astype(np.uint8),
        rng.integers(0, 256, (16, 16, 3), dtype=np.int64).astype(np.uint8),
    ]
    for img in cases:
        for q in (30, 75, 95):  # sparse → dense coefficient regimes
            base = decode_jpeg(encode_jpeg(img, q))
            prog_bytes = encode_jpeg_progressive(img, q)
            assert b"\xff\xc2" in prog_bytes  # really SOF2
            assert prog_bytes.count(b"\xff\xda") >= 4  # multi-scan script
            assert np.array_equal(decode_jpeg(prog_bytes), base)


def test_baseline_mislabeled_as_progressive_fails_fast():
    img = _smooth(1, 16, 16, 1)
    data = bytearray(encode_jpeg(img, 85))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # relabel SOF0 as SOF2: scan header is now invalid
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_unsupported_sof_markers_rejected():
    img = _smooth(1, 16, 16, 1)
    for sof in (0xC3, 0xC7, 0xCA, 0xCF):
        data = bytearray(encode_jpeg(img, 85))
        i = data.find(b"\xff\xc0")
        data[i + 1] = sof
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


def _reencode_420(img: np.ndarray) -> bytes:
    """Hand-build a 4:2:0 stream (encoder only writes 4:4:4): encode each
    plane as its own grayscale JPEG is not valid 420 — instead synthesize
    via the public layout: reuse encode_jpeg's machinery by subsampling
    chroma and interleaving 4 Y blocks + 1 Cb + 1 Cr per MCU."""
    import struct

    from jigsaw_spark.multimodal import jpeg_codec as J

    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = Y.shape
    # chroma subsample 2x2 mean
    def sub(p):
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4

    Cb_s, Cr_s = sub(Cb), sub(Cr)
    lum_q, chrom_q = J._quality_tables(85)

    mcu_h, mcu_w = -(-h // 16), -(-w // 16)

    def padto(p, bh, bw):
        return np.pad(
            p, ((0, bh - p.shape[0]), (0, bw - p.shape[1])), mode="edge"
        )

    Yp = padto(Y, mcu_h * 16, mcu_w * 16)
    Cbp = padto(Cb_s, mcu_h * 8, mcu_w * 8)
    Crp = padto(Cr_s, mcu_h * 8, mcu_w * 8)

    out = bytearray(b"\xff\xd8")
    for tid, tab in enumerate([lum_q, chrom_q]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tab.flatten()[J.ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, (bits, vals) in [
        (0x00, J.DC_LUM),
        (0x10, J.AC_LUM),
        (0x01, J.DC_CHROM),
        (0x11, J.AC_CHROM),
    ]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"

    wtr = J._BitWriter()
    dc_lum = J._huff_codes(*J.DC_LUM)
    ac_lum = J._huff_codes(*J.AC_LUM)
    dc_chr = J._huff_codes(*J.DC_CHROM)
    ac_chr = J._huff_codes(*J.AC_CHROM)
    py, pcb, pcr = 0, 0, 0
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    py = J._encode_block(
                        wtr, Yp[y0 : y0 + 8, x0 : x0 + 8], lum_q, py, dc_lum, ac_lum
                    )
            pcb = J._encode_block(
                wtr,
                Cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                chrom_q,
                pcb,
                dc_chr,
                ac_chr,
            )
            pcr = J._encode_block(
                wtr,
                Crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                chrom_q,
                pcr,
                dc_chr,
                ac_chr,
            )
    wtr.flush()
    out += wtr.buf + b"\xff\xd9"
    return bytes(out)


def test_420_subsampled_stream_decodes():
    img = _smooth(5, 40, 56, 3)
    out = decode_jpeg(_reencode_420(img))
    assert out.shape == img.shape
    assert _psnr(img, out) > 26.0  # chroma halved: lower bar than 4:4:4


def test_decode_pixels_integration():
    from jigsaw_spark.multimodal.binary_ops import _decode_pixels

    img = _smooth(7, 24, 32, 3)
    out = _decode_pixels(encode_jpeg(img, 90), fake=False)
    assert out.shape == (24, 32, 3)
    assert _psnr(img, out) > 30.0


def _reencode_with_restarts(img: np.ndarray, restart: int) -> bytes:
    """Hand-build a grayscale stream with a DRI interval: RSTn markers
    every `restart` MCUs, DC predictors reset at each (the spec path the
    encoder itself never emits)."""
    import struct

    from jigsaw_spark.multimodal import jpeg_codec as J

    h, w = img.shape
    lum_q, _ = J._quality_tables(85)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(
        img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(x) for x in lum_q.flatten()[J.ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for tc_th, (bits, vals) in [(0x00, J.DC_LUM), (0x10, J.AC_LUM)]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xdd" + struct.pack(">HH", 4, restart)  # DRI
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00]) + b"\x00\x3f\x00"

    dc_m, ac_m = J._huff_codes(*J.DC_LUM), J._huff_codes(*J.AC_LUM)
    wtr = J._BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart and mcu and mcu % restart == 0:
                wtr.flush()
                out += wtr.buf
                wtr = J._BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = 0  # spec: predictors reset at RST
            pred = J._encode_block(
                wtr, plane[by : by + 8, bx : bx + 8], lum_q, pred, dc_m, ac_m
            )
            mcu += 1
    wtr.flush()
    out += wtr.buf + b"\xff\xd9"
    return bytes(out)


def test_restart_interval_stream_decodes():
    img = _smooth(13, 40, 48, 1)
    out = decode_jpeg(_reencode_with_restarts(img, restart=2))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30.0


def _progressive_420(img: np.ndarray) -> bytes:
    """Hand-build a PROGRESSIVE (SOF2) 4:2:0 stream from the same planes
    and quantizers as `_reencode_420`: interleaved DC scans walk the MCU
    grid (4 Y + 1 Cb + 1 Cr), AC scans walk each component's own natural
    block grid (T.81 non-interleaved rule) — the layout wild progressive
    photos use."""
    import struct

    from jigsaw_spark.multimodal import jpeg_codec as J

    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = Y.shape

    def sub(p):
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4

    Cb_s, Cr_s = sub(Cb), sub(Cr)
    lum_q, chrom_q = J._quality_tables(85)
    mcu_h, mcu_w = -(-h // 16), -(-w // 16)

    def padto(p, bh, bw):
        return np.pad(
            p, ((0, bh - p.shape[0]), (0, bw - p.shape[1])), mode="edge"
        )

    qY = J._quantize_plane(padto(Y, mcu_h * 16, mcu_w * 16), lum_q)
    qCb = J._quantize_plane(padto(Cb_s, mcu_h * 8, mcu_w * 8), chrom_q)
    qCr = J._quantize_plane(padto(Cr_s, mcu_h * 8, mcu_w * 8), chrom_q)

    out = bytearray(b"\xff\xd8")
    for tid, tab in enumerate([lum_q, chrom_q]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tab.flatten()[J.ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, (bits, vals) in [
        (0x00, J.DC_LUM),
        (0x10, J.AC_LUM),
        (0x01, J.DC_CHROM),
        (0x11, J.AC_CHROM),
    ]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    dc_lum, ac_lum = J._huff_codes(*J.DC_LUM), J._huff_codes(*J.AC_LUM)
    dc_chr, ac_chr = J._huff_codes(*J.DC_CHROM), J._huff_codes(*J.AC_CHROM)
    comps = [
        (1, qY, 2, 2, dc_lum, ac_lum, 0),
        (2, qCb, 1, 1, dc_chr, ac_chr, 1),
        (3, qCr, 1, 1, dc_chr, ac_chr, 1),
    ]
    # natural (non-interleaved) grids per component
    nat = {
        1: (-(-h // 8), -(-w // 8)),
        2: (-(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8)),
        3: (-(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8)),
    }

    def sos(ids_tabs, ss, se, ah, al):
        out.extend(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(ids_tabs), len(ids_tabs))
        )
        for cid, tt in ids_tabs:
            out.extend(bytes([cid, tt]))
        out.extend(bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1
    sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    wtr = J._BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for cid, q, hs, vs, dcm, _acm, _ in comps:
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(q[my * vs + by, mx * hs + bx, 0]) >> 1
                        size, bits = J._magnitude(dc - preds[cid])
                        code, length = dcm[size]
                        wtr.write(code, length)
                        if size:
                            wtr.write(bits, size)
                        preds[cid] = dc
    wtr.flush()
    out += wtr.buf

    # scans 2-4: AC first per component over its natural grid, Al=1
    for cid, q, _hs, _vs, _dcm, acm, ta in comps:
        sos([(cid, ta << 0 | (ta << 4))], 1, 63, 0, 1)
        wtr = J._BitWriter()
        bh, bw = nat[cid]
        blocks = [q[by, bx] for by in range(bh) for bx in range(bw)]
        J._ac_first_scan(blocks, J._writer_emitters(wtr, acm), 1)
        wtr.flush()
        out += wtr.buf

    # scan 5: DC refinement, interleaved, raw bits
    sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0)
    wtr = J._BitWriter()
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for cid, q, hs, vs, _dcm, _acm, _ in comps:
                for by in range(vs):
                    for bx in range(hs):
                        wtr.write(int(q[my * vs + by, mx * hs + bx, 0]) & 1, 1)
    wtr.flush()
    out += wtr.buf

    # scans 6-8: AC refinement per component over its natural grid
    for cid, q, _hs, _vs, _dcm, acm, ta in comps:
        sos([(cid, ta << 0 | (ta << 4))], 1, 63, 1, 0)
        wtr = J._BitWriter()
        bh, bw = nat[cid]
        blocks = [q[by, bx] for by in range(bh) for bx in range(bw)]
        J._ac_refine_scan(blocks, J._writer_emitters(wtr, acm))
        wtr.flush()
        out += wtr.buf

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_420_parity_with_baseline_420():
    """Progressive 4:2:0 (interleaved DC over the MCU grid, AC scans over
    each component's NATURAL grid) must reproduce the baseline 4:2:0
    decode on all visible pixels — same planes, same quantizers; only
    MCU-padding blocks (cropped out) can differ."""
    for seed, (h, w) in [(5, (40, 56)), (11, (34, 50))]:
        img = _smooth(seed, h, w, 3)
        base = decode_jpeg(_reencode_420(img))
        prog = decode_jpeg(_progressive_420(img))
        assert prog.shape == base.shape
        assert np.array_equal(prog, base)
        assert _psnr(img, prog) > 26.0


# ---------------------------------------------------------------------------
# Cross-block EOBn runs (coalesce_eob=True): the layout wild libjpeg
# progressive files use heavily — multi-block eobrun-skip in AC-first and
# cross-block correction-bit tails in AC-refine (advisor finding r3: those
# decoder branches previously matched jdphuff.c by inspection only).
# ---------------------------------------------------------------------------


def _block_img(coef_blocks: list[np.ndarray], qt: np.ndarray) -> np.ndarray:
    """8x(8n) grayscale image whose quantized coefficients reproduce the
    given per-block zigzag coefficient arrays (idct of dequantized
    coefficients; smooth single-basis content keeps pixel-rounding noise
    below half a quant step, so the encoder's forward path recovers the
    intended quantized values)."""
    from jigsaw_spark.multimodal.jpeg_codec import ZIGZAG

    cols = []
    for zz in coef_blocks:
        nat = np.zeros(64)
        nat[ZIGZAG] = zz * qt.flatten()[ZIGZAG]
        blk = DCT_M.T @ nat.reshape(8, 8) @ DCT_M + 128.0
        cols.append(np.clip(np.round(blk), 0, 255).astype(np.uint8))
    return np.concatenate(cols, axis=1)


def _scan_symbol_log(blocks, scan_fn, *args):
    """Run a scan emitter with recording callbacks → [('S', sym) | ('B', n)]."""
    log: list[tuple[str, int]] = []
    em = (
        lambda sym: log.append(("S", sym)),
        lambda value, n: log.append(("B", n)) if n else None,
    )
    scan_fn(blocks, em, *args)
    return log


def test_progressive_coalesced_eob_parity_and_runs():
    """coalesce_eob=True must decode identically to baseline AND actually
    emit EOBn (r>0) runs spanning several blocks in both AC scans."""
    from jigsaw_spark.multimodal.jpeg_codec import (
        _ac_first_scan,
        _ac_refine_scan,
        _quality_tables,
        _quantize_plane,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    # textured first block, a long flat run, textured, flat tail — guarantees
    # multi-block EOB runs in the middle AND at scan end
    img = np.full((8, 8 * 12), 128, dtype=np.uint8)
    img[:, :8] = rng.integers(0, 256, (8, 8))
    img[:, 8 * 7 : 8 * 8] = rng.integers(0, 256, (8, 8))
    for q in (30, 85):
        base = decode_jpeg(encode_jpeg(img, q))
        data = encode_jpeg_progressive(img, q, coalesce_eob=True)
        assert b"\xff\xc2" in data
        assert np.array_equal(decode_jpeg(data), base)

    # the stream really contains EOBn with r>0 in the AC-first scan
    lum_q, _ = _quality_tables(85)
    qblocks = _quantize_plane(np.pad(img, ((0, 0), (0, 0)), mode="edge").astype(np.float64), lum_q)
    blocks = [qblocks[0, bx] for bx in range(qblocks.shape[1])]
    first_log = _scan_symbol_log(blocks, _ac_first_scan, 1, 0x7FFF)
    eobn = [s for k, s in first_log if k == "S" and s & 0x0F == 0 and s != 0xF0 and s >> 4 > 0]
    assert eobn, "no EOBn (r>0) symbol in coalesced AC-first scan"


def test_progressive_refine_eobn_with_cross_block_corrections():
    """AC-refine EOBn runs whose covered blocks carry history coefficients:
    the correction bits buffered across blocks must decode bit-exactly
    (the jdphuff.c tail-walk path)."""
    from jigsaw_spark.multimodal.jpeg_codec import (
        _ac_refine_scan,
        _quality_tables,
        encode_jpeg_progressive,
    )

    lum_q, _ = _quality_tables(85)
    z = np.zeros(64, dtype=np.int64)

    def zz(**kw):
        out = z.copy()
        for slot, v in kw.items():
            out[int(slot[1:])] = v
        return out

    # scan-order blocks: [new-nonzero content] [history-only (av=6,4 →
    # correction bits, no new |v|=1)] [all-zero] [history-only] [content]
    # [all-zero tail] — the middle run covers 3 blocks with pend bits
    coef_blocks = [
        zz(s1=3, s2=1),          # content: |1| present → emits symbols
        zz(s1=6, s3=4),          # joins run, 2 correction bits
        zz(),                    # joins run, no bits
        zz(s2=5),                # joins run, 1 correction bit
        zz(s1=2, s4=1, s5=1),    # content again → run flushes before this
        zz(s1=8),                # tail run with a correction bit
    ]
    img = _block_img(coef_blocks, lum_q)
    base = decode_jpeg(encode_jpeg(img, 85))
    data = encode_jpeg_progressive(img, 85, coalesce_eob=True)
    assert np.array_equal(decode_jpeg(data), base)

    # emitter-level: the refine scan really produces an EOBn r>0 symbol
    # followed by buffered correction bits (cross-block pend path)
    from jigsaw_spark.multimodal.jpeg_codec import _quantize_plane

    qb = _quantize_plane(img.astype(np.float64), lum_q)
    blocks = [qb[0, bx] for bx in range(qb.shape[1])]
    log = _scan_symbol_log(blocks, _ac_refine_scan, 0x7FFF)
    for i, (k, s) in enumerate(log):
        if k == "S" and s != 0xF0 and s & 0x0F == 0 and s >> 4 > 0:
            tail = log[i + 1 :]
            nbits = 0
            for kk, _ in tail:
                if kk != "B":
                    break
                nbits += 1
            assert nbits >= 2, "EOBn not followed by buffered correction bits"
            break
    else:
        raise AssertionError("no EOBn (r>0) in coalesced AC-refine scan")


def test_progressive_per_block_output_unchanged_by_refactor():
    """max_run=1 (the default) must still produce streams the baseline
    tables decode — regression guard for the scan-emitter refactor."""
    from jigsaw_spark.multimodal.jpeg_codec import encode_jpeg_progressive

    img = _smooth(5, 24, 32, 3)
    base = decode_jpeg(encode_jpeg(img, 75))
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(img, 75)), base)


def _count_rst(data: bytes) -> int:
    return sum(
        1
        for i in range(len(data) - 1)
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
    )


def test_progressive_wild_layout_eobn_sa_restarts():
    """The layout wild libjpeg files actually emit — EOBn>1 runs,
    successive approximation (Al=1 first + Ah=1 refine), and restart
    markers in the SAME scan script — must decode to baseline parity.
    restart_interval=5 over 12 blocks also truncates an EOB run that
    would otherwise span the boundary (blocks 1-6 are flat), so the
    decoder's rst() eobrun/pend reset path is really exercised."""
    from jigsaw_spark.multimodal.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    img = np.full((8, 8 * 12), 128, dtype=np.uint8)
    img[:, :8] = rng.integers(0, 256, (8, 8))          # block 0 textured
    img[:, 8 * 7 : 8 * 8] = rng.integers(0, 256, (8, 8))  # block 7 textured
    for q in (30, 85):
        base = decode_jpeg(encode_jpeg(img, q))
        data = encode_jpeg_progressive(
            img, q, coalesce_eob=True, restart_interval=5
        )
        assert b"\xff\xc2" in data  # SOF2: progressive
        assert b"\xff\xdd" in data  # DRI present
        # 4 scans x 2 boundaries each (12 MCUs / interval 5 -> 3 chunks)
        assert _count_rst(data) == 8
        assert np.array_equal(decode_jpeg(data), base)

    # same layout on RGB (3 components, per-component AC scans)
    rgb = _smooth(13, 16, 8 * 9, 3)
    base = decode_jpeg(encode_jpeg(rgb, 75))
    data = encode_jpeg_progressive(
        rgb, 75, coalesce_eob=True, restart_interval=4
    )
    assert _count_rst(data) > 0
    assert np.array_equal(decode_jpeg(data), base)

    # restart_interval composes with the per-block default emitter too
    plain = encode_jpeg_progressive(img, 85, restart_interval=5)
    assert _count_rst(plain) == 8
    assert np.array_equal(
        decode_jpeg(plain), decode_jpeg(encode_jpeg(img, 85))
    )
