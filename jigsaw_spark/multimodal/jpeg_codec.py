"""Pure-Python JPEG codec (numpy only — no cv2/PIL).

Implements the public ITU-T T.81 / JFIF spec: baseline sequential DCT
AND progressive DCT (SOF2), 8-bit, Huffman entropy coding with the
Annex K standard tables.

- ``encode_jpeg``: grayscale or RGB → 4:4:4 baseline JFIF bytes.
- ``encode_jpeg_progressive``: same input → SOF2 progressive JFIF with a
  4-scan script exercising both spectral selection (DC scan + AC band
  scan) and successive approximation (Al=1 first pass + Ah=1/Al=0
  refinement passes) — primarily the parity fixture for the decoder.
- ``decode_jpeg``: baseline OR progressive JFIF → uint8 ndarray;
  accepts 4:4:4, 4:2:2 and 4:2:0 sampling and restart intervals.
  Progressive scans (T.81 §G.1.2: DC first/refine, AC first/refine with
  EOB-run coding) accumulate into per-component coefficient arrays and
  reconstruct at EOI — wild ``.jpg`` imagery is very often progressive,
  so the fetch path (S7) needs this, not just baseline.

This un-stubs the non-PNG branch of ``binary_ops._decode_pixels`` for
the JPEG payloads the reference fetches (jigsaw/io_utils.py:15-41 pulls
.jpg imagery; masks stay PNG). JPEG is lossy: round-trips are verified
by PSNR, not byte equality (tests/test_jpeg_codec.py).

Like png_codec, this runs INSIDE Arrow-batched kernels — per-row Python
is the accepted cost of a codec boundary, not a relational operator.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K quantization tables (luminance / chrominance) ---------------
STD_LUM_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
STD_CHROM_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# zigzag order: ZIGZAG[i] = flat (row*8+col) index of the i-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
UNZIGZAG = np.argsort(ZIGZAG)

# --- Annex K standard Huffman tables: (BITS counts[1..16], HUFFVAL) ------
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: dct2d(B) = C @ B @ C.T
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0, :] = np.sqrt(1.0 / 8.0)


def _huff_codes(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode_map(bits, vals):
    """(length, code) -> symbol."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_tables(quality: int):
    q = max(1, min(100, quality))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    lum = np.clip(np.floor((STD_LUM_Q * scale + 50) / 100), 1, 255)
    chrom = np.clip(np.floor((STD_CHROM_Q * scale + 50) / 100), 1, 255)
    return lum, chrom


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + value bits (negative = ones' complement)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w: _BitWriter, block, qtab, dc_pred, dc_map, ac_map) -> int:
    coef = DCT_M @ (block - 128.0) @ DCT_M.T
    q = np.round(coef / qtab).astype(np.int64).flatten()[ZIGZAG]
    dc = int(q[0])
    size, bits = _magnitude(dc - dc_pred)
    code, length = dc_map[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = 0
    nz = np.nonzero(q[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_map[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]  # EOB
        w.write(code, length)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline 4:4:4 JFIF."""
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    h, w = planes[0].shape
    lum_q, chrom_q = _quality_tables(quality)
    qtabs = [lum_q] + [chrom_q] * (len(planes) - 1)

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    for tid, tab in enumerate([lum_q] + ([chrom_q] if len(planes) > 1 else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tab.flatten()[ZIGZAG])
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
    huffs = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if ncomp > 1:
        huffs += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tc_th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_lum_m, ac_lum_m = _huff_codes(*DC_LUM), _huff_codes(*AC_LUM)
    dc_chr_m, ac_chr_m = _huff_codes(*DC_CHROM), _huff_codes(*AC_CHROM)
    writer = _BitWriter()
    preds = [0] * ncomp
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                dc_m = dc_lum_m if ci == 0 else dc_chr_m
                ac_m = ac_lum_m if ci == 0 else ac_chr_m
                preds[ci] = _encode_block(
                    writer,
                    plane[by : by + 8, bx : bx + 8],
                    qtabs[ci],
                    preds[ci],
                    dc_m,
                    ac_m,
                )
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops cleanly at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST: caller resyncs via sync_rst
                return False
            else:  # real marker: end of scan
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError("entropy data exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_rst(self) -> None:
        """Skip to just past the next RST marker, discarding bit state."""
        self.acc = self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_huff(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JFIF → uint8 (h, w) or (h, w, 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    progressive = False
    coefs: list[np.ndarray] | None = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                n = 64 * (2 if pq else 1)
                raw = seg[i + 1 : i + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2")
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.float64)
                tab = np.zeros(64)
                tab[ZIGZAG] = vals
                qtabs[tq] = tab.reshape(8, 8)
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                huff[(tc, th)] = _huff_decode_map(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (
            0xC3,  # lossless sequential
            0xC5, 0xC6, 0xC7,  # differential sequential/progressive/lossless
            0xC9, 0xCA, 0xCB,  # arithmetic-coded variants
            0xCD, 0xCE, 0xCF,  # differential arithmetic variants
        ):
            # fail fast and named — falling through used to surface later
            # as a confusing KeyError or silent garbage pixels
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (marker 0x{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_cis = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
                        scan_cis.append(ci)
            pos += seglen
            if not progressive:
                return _decode_scan(
                    data, pos, h, w, comps, qtabs, huff, restart
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
                coefs = [
                    np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                    )
                    for c in comps
                ]
            pos = _decode_progressive_scan(
                data, pos, scan_cis, comps, coefs, huff, restart,
                ss, se, ah, al, w, h,
            )
            continue  # next marker; seglen already consumed
        pos += seglen
    if progressive and coefs is not None:
        return _reconstruct_from_coefs(coefs, comps, qtabs, h, w)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, h, w, comps, qtabs, huff, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"])) for c in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.sync_rst()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = huff[(0, c["td"])], huff[(1, c["ta"])]
                qt = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        size = _decode_huff(reader, dc_t)
                        diff = _extend(reader.bits(size), size)
                        preds[ci] += diff
                        zz = np.zeros(64)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(reader, ac_t)
                            if sym == 0x00:
                                break
                            run, sz = sym >> 4, sym & 0xF
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                # consuming the size bits anyway would not
                                # help: the symbol stream is already invalid,
                                # and a silent break desyncs every later block
                                raise ValueError("corrupt AC run (k > 63)")
                            zz[k] = _extend(reader.bits(sz), sz)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz
                        block = (
                            DCT_M.T @ (coef.reshape(8, 8) * qt) @ DCT_M
                        ) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


def _decode_progressive_scan(
    data, pos, scan_cis, comps, coefs, huff, restart, ss, se, ah, al, w, h
):
    """One progressive scan (T.81 §G.1.2) into the per-component
    coefficient accumulators; returns the byte position of the marker
    that ends the scan. Coefficients are kept in zigzag order.

    Four scan kinds: DC first (ah=0, ss=0), DC refinement (ah>0, ss=0),
    AC first (ah=0, ss>0) with EOB-run coding, AC refinement (ah>0,
    ss>0) with the correction-bit state machine (the libjpeg
    decode_mcu_AC_refine algorithm from the public spec)."""
    reader = _BitReader(data, pos)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    preds = {ci: 0 for ci in scan_cis}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def dc_first(ci, by, bx):
        size = _decode_huff(reader, huff[(0, comps[ci]["td"])])
        preds[ci] += _extend(reader.bits(size), size)
        coefs[ci][by, bx, 0] = preds[ci] << al

    def dc_refine(ci, by, bx):
        if reader.bit():
            # two's-complement OR reconstructs bit `al` for any sign
            coefs[ci][by, bx, 0] |= p1

    def ac_first(ci, by, bx):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        blk = coefs[ci][by, bx]
        tab = huff[(1, comps[ci]["ta"])]
        k = ss
        while k <= se:
            rs = _decode_huff(reader, tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # EOBn: this block ends now
                if r:
                    eobrun += reader.bits(r)
                return
            k += r
            if k > se:
                raise ValueError("corrupt AC run (k > Se)")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1

    def ac_refine(ci, by, bx):
        nonlocal eobrun
        blk = coefs[ci][by, bx]
        tab = huff[(1, comps[ci]["ta"])]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(reader, tab)
                r, s = rs >> 4, rs & 15
                val = 0
                if s:
                    if s != 1:
                        raise ValueError("bad refinement magnitude")
                    val = p1 if reader.bit() else m1
                elif r != 15:
                    eobrun = 1 << r  # EOBn: includes this block's tail
                    if r:
                        eobrun += reader.bits(r)
                    break
                # advance over r zero-history slots, emitting correction
                # bits at every nonzero-history coefficient passed
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:  # correction bits for the block's tail
                c = int(blk[k])
                if c != 0:
                    if reader.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1

    if ss == 0:
        if se != 0:
            raise ValueError(
                "invalid progressive scan header (DC scan must have Se=0 — "
                "is this a baseline stream mislabeled SOF2?)"
            )
        decode_block = dc_refine if ah else dc_first
    else:
        if len(scan_cis) != 1:
            raise ValueError("AC progressive scan must be single-component")
        decode_block = ac_refine if ah else ac_first

    def rst():
        nonlocal eobrun
        reader.sync_rst()
        for ci in preds:
            preds[ci] = 0
        eobrun = 0

    mcu = 0
    if len(scan_cis) > 1:
        # interleaved (DC scans only): MCU = sampling-factor block cluster
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and mcu and mcu % restart == 0:
                    rst()
                for ci in scan_cis:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                ci, my * c["v"] + by, mx * c["h"] + bx
                            )
                mcu += 1
    else:
        # non-interleaved: MCU = one block, over the component's own grid
        ci = scan_cis[0]
        c = comps[ci]
        comp_w = -(-w * c["h"] // hmax)  # ceil: component's sample width
        comp_h = -(-h * c["v"] // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        for by in range(bh):
            for bx in range(bw):
                if restart and mcu and mcu % restart == 0:
                    rst()
                decode_block(ci, by, bx)
                mcu += 1
    return reader.pos


def _reconstruct_from_coefs(coefs, comps, qtabs, h, w):
    """Dequantize + IDCT the accumulated progressive coefficients and
    assemble the final image (same upsample/color path as baseline)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        arr = coefs[ci]
        nby, nbx = arr.shape[:2]
        qt = qtabs[c["tq"]]
        nat = arr[:, :, UNZIGZAG].reshape(nby, nbx, 8, 8) * qt
        blocks = np.einsum("ki,yxkl,lj->yxij", DCT_M, nat, DCT_M) + 128.0
        p = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 85,
    coalesce_eob: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → SOF2 progressive 4:4:4
    JFIF with a 4-stage scan script:

      1. DC first scan, interleaved, Al=1 (successive approximation)
      2. AC first scan per component, band 1-63, Al=1 (spectral selection)
      3. DC refinement, Ah=1/Al=0 (raw bits, no Huffman)
      4. AC refinement per component, Ah=1/Al=0 (correction-bit coding)

    Every progressive decode path is exercised. With the default
    ``coalesce_eob=False``, EOB runs are flushed per block (EOBRUN=1 via
    symbol 0x00) so the Annex K baseline AC tables suffice. With
    ``coalesce_eob=True``, end-of-band runs span blocks as EOBn symbols
    (up to 32767) with per-scan optimal Huffman tables emitted before
    each AC SOS — the layout wild libjpeg-encoded progressive files use
    heavily, exercising the decoder's multi-block eobrun-skip (AC first)
    and cross-block correction-bit tail (AC refine) paths. Quantized
    coefficients are identical to ``encode_jpeg`` at the same quality,
    so every variant's decode must match the baseline decode
    bit-for-bit (the parity tests).

    ``restart_interval > 0`` emits a DRI segment and RSTn markers every
    that many MCUs in EVERY scan (T.81 §F.2.1.3 / §G): at each restart
    the bit stream pads to a byte boundary, DC predictors reset, and —
    critically — the EOB run and its buffered correction bits flush, so
    no EOBn run crosses a restart boundary. Combined with
    ``coalesce_eob=True`` this produces the full wild-libjpeg layout
    (EOBn>1 + successive approximation + restarts in one scan), the
    exact stream shape the decoder's ``rst()`` resync path consumes.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("expected (h,w) or (h,w,3) uint8")
    h, w = planes[0].shape
    lum_q, chrom_q = _quality_tables(quality)
    qtabs = [lum_q] + [chrom_q] * (len(planes) - 1)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    ncomp = len(planes)
    nby, nbx = ph // 8, pw // 8

    # quantize every block once (zigzag order), shared by all scans
    q = [
        _quantize_plane(plane, qtabs[ci]) for ci, plane in enumerate(planes)
    ]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in enumerate([lum_q] + ([chrom_q] if ncomp > 1 else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tab.flatten()[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
    huffs = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if ncomp > 1:
        huffs += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tc_th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_maps = [_huff_codes(*(DC_LUM if ci == 0 else DC_CHROM)) for ci in range(ncomp)]
    ac_maps = [_huff_codes(*(AC_LUM if ci == 0 else AC_CHROM)) for ci in range(ncomp)]

    def sos(cis, ss, se, ah, al):
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(cis), len(cis)))
        for ci in cis:
            td = ci if ncomp > 1 and ci else 0
            out.extend(bytes([ci + 1, (min(td, 1) << 4) | min(td, 1)]))
        out.extend(bytes([ss, se, (ah << 4) | al]))

    def emit_rst(wtr: _BitWriter, n: int) -> _BitWriter:
        """Flush the entropy segment, write RSTn (n cycles mod 8), and
        hand back a fresh writer for the next restart segment."""
        wtr.flush()
        out.extend(wtr.buf)
        out.extend(bytes([0xFF, 0xD0 + (n & 7)]))
        return _BitWriter()

    # --- scan 1: DC first, interleaved, Al=1 ------------------------------
    sos(list(range(ncomp)), 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0] * ncomp
    mcu = rst_n = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr = emit_rst(wtr, rst_n)
                rst_n += 1
                preds = [0] * ncomp  # DC predictors reset at a restart
            for ci in range(ncomp):
                dc = int(q[ci][by, bx, 0]) >> 1  # arithmetic point transform
                size, bits = _magnitude(dc - preds[ci])
                code, length = dc_maps[ci][size]
                wtr.write(code, length)
                if size:
                    wtr.write(bits, size)
                preds[ci] = dc
            mcu += 1
    wtr.flush()
    out += wtr.buf

    max_run = 0x7FFF if coalesce_eob else 1

    def blocks_of(ci):
        return (q[ci][by, bx] for by in range(nby) for bx in range(nbx))

    def restart_chunks(ci):
        """Non-interleaved AC scans: MCU = one block, so each restart
        segment is an independent ``restart_interval``-block chunk —
        EOB runs and correction-bit buffers cannot cross it."""
        blocks = list(blocks_of(ci))
        if not restart_interval:
            return [blocks]
        return [
            blocks[i : i + restart_interval]
            for i in range(0, len(blocks), restart_interval)
        ]

    def ac_table_for(ci, emit_scan):
        """Coalescing scans need EOBn codes the Annex K tables lack:
        build a per-scan optimal table and emit its DHT (overwriting the
        component's AC table id, as libjpeg's optimized scans do)."""
        if not coalesce_eob:
            return ac_maps[ci]
        th = 0 if ci == 0 else 1
        bits, vals, ac_map = _optimal_scan_table(emit_scan)
        out.extend(b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), 0x10 | th))
        out.extend(bytes(bits) + bytes(vals))
        return ac_map

    # --- scan 2: AC first per component, band 1-63, Al=1 ------------------
    for ci in range(ncomp):
        chunks = restart_chunks(ci)

        def emit_all(em, chunks=chunks):
            for ch in chunks:
                _ac_first_scan(ch, em, 1, max_run)

        ac_map = ac_table_for(ci, emit_all)
        sos([ci], 1, 63, 0, 1)
        wtr = _BitWriter()
        for i, ch in enumerate(chunks):
            if i:
                wtr = emit_rst(wtr, i - 1)
            _ac_first_scan(ch, _writer_emitters(wtr, ac_map), 1, max_run)
        wtr.flush()
        out += wtr.buf

    # --- scan 3: DC refinement, interleaved, Ah=1/Al=0 (raw bits) ---------
    sos(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    mcu = rst_n = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr = emit_rst(wtr, rst_n)
                rst_n += 1
            for ci in range(ncomp):
                wtr.write(int(q[ci][by, bx, 0]) & 1, 1)
            mcu += 1
    wtr.flush()
    out += wtr.buf

    # --- scan 4: AC refinement per component, Ah=1/Al=0 -------------------
    for ci in range(ncomp):
        chunks = restart_chunks(ci)

        def emit_all(em, chunks=chunks):
            for ch in chunks:
                _ac_refine_scan(ch, em, max_run)

        ac_map = ac_table_for(ci, emit_all)
        sos([ci], 1, 63, 1, 0)
        wtr = _BitWriter()
        for i, ch in enumerate(chunks):
            if i:
                wtr = emit_rst(wtr, i - 1)
            _ac_refine_scan(ch, _writer_emitters(wtr, ac_map), max_run)
        wtr.flush()
        out += wtr.buf

    out += b"\xff\xd9"
    return bytes(out)


def _ac_point(v: int, al: int) -> int:
    """AC point transform truncates toward zero (T.81 §G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _writer_emitters(wtr: _BitWriter, ac_map):
    """(emit_sym, emit_bits) callbacks writing through a Huffman map."""

    def emit_sym(sym: int) -> None:
        code, length = ac_map[sym]
        wtr.write(code, length)

    def emit_bits(value: int, n: int) -> None:
        if n:
            wtr.write(value, n)

    return emit_sym, emit_bits


def _emit_eobn(emit_sym, emit_bits, n: int) -> None:
    """EOBn symbol for an end-of-band run of ``n`` blocks (T.81
    §G.1.2.2): symbol (r<<4) with r = floor(log2 n), then the low r bits
    of n. n=1 is the plain EOB (symbol 0x00); n up to 32767 (r=14)."""
    r = n.bit_length() - 1
    emit_sym(r << 4)
    emit_bits(n - (1 << r), r)


def _ac_first_scan(blocks, emitters, al: int, max_run: int = 1) -> None:
    """AC first scan (Ah=0) over one component's blocks in scan order.

    ``max_run=1`` flushes EOB per block (EOBRUN=1, symbol 0x00) so the
    baseline Annex K tables suffice — byte-identical to the historic
    per-block emitter. ``max_run>1`` coalesces end-of-band runs across
    blocks into EOBn symbols (the layout wild libjpeg-progressive files
    use heavily), which requires an AC table carrying the (r<<4) EOBn
    symbols — see ``_optimal_scan_table``."""
    emit_sym, emit_bits = emitters
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            _emit_eobn(emit_sym, emit_bits, eobrun)
            eobrun = 0

    for zz in blocks:
        band = [_ac_point(int(v), al) for v in zz[1:64]]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:  # whole band zero: block joins the EOB run
            eobrun += 1
            if eobrun >= max_run:
                flush()
            continue
        flush()  # EOBn lands at the first covered block's position
        last = nz[-1]
        run = 0
        for i in range(last + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                emit_sym(0xF0)
                run -= 16
            size, bits = _magnitude(v)
            emit_sym((run << 4) | size)
            emit_bits(bits, size)
            run = 0
        if last < 62:  # zero tail: this block's EOB joins the run
            eobrun += 1
            if eobrun >= max_run:
                flush()
    flush()


def _ac_refine_scan(blocks, emitters, max_run: int = 1) -> None:
    """AC refinement scan (Ah=1, Al=0) over one component's blocks —
    the jcphuff.c algorithm: the ZRL check runs at EVERY nonzero slot
    before buffering its correction bit, so pending bits always lie
    within the 16-zero window the matching decoder walk consumes.

    With ``max_run>1``, blocks whose band holds no newly-nonzero
    coefficient join a cross-block EOB run; their history-coefficient
    correction bits are buffered and emitted right after the EOBn
    symbol, in block order — exactly the stream the decoder's
    ``eobrun > 0`` tail walk consumes (jdphuff.c decode_mcu_AC_refine)."""
    emit_sym, emit_bits = emitters
    eobrun = 0
    pend: list[int] = []

    def flush() -> None:
        nonlocal eobrun, pend
        if eobrun:
            _emit_eobn(emit_sym, emit_bits, eobrun)
            for bit in pend:
                emit_bits(bit, 1)
            eobrun = 0
        pend = []

    for zz in blocks:
        band = [int(v) for v in zz[1:64]]
        eob = -1
        for i, v in enumerate(band):
            if abs(v) == 1:
                eob = i  # last newly-nonzero slot
        if eob < 0:  # no new nonzeros: whole block joins the run
            eobrun += 1
            pend.extend(abs(v) & 1 for v in band if v)
            if eobrun >= max_run:
                flush()
            continue
        flush()
        br: list[int] = []
        run = 0
        for i in range(eob + 1):
            v = band[i]
            av = abs(v)
            if av == 0:
                run += 1
                continue
            while run > 15:
                emit_sym(0xF0)
                run -= 16
                for bit in br:
                    emit_bits(bit, 1)
                br = []
            if av > 1:  # history-nonzero: one correction bit
                br.append(av & 1)
                continue
            emit_sym((run << 4) | 1)
            emit_bits(1 if v > 0 else 0, 1)  # sign
            for bit in br:
                emit_bits(bit, 1)
            br = []
            run = 0
        if eob < 62:  # band tail: EOB joins the run, tail bits buffered
            eobrun += 1
            pend.extend(abs(v) & 1 for v in band[eob + 1 :] if v)
            if eobrun >= max_run:
                flush()
    flush()


def _optimal_scan_table(emit_scan) -> tuple[list[int], list[int], dict]:
    """Build a per-scan AC Huffman table covering exactly the symbols the
    scan emits (EOBn symbols included — the Annex K baseline tables have
    no codes for (r<<4), r in 1..14). Counting pass runs ``emit_scan``
    with recording callbacks; all symbols get equal-length codes with
    the all-ones codeword left unused (JPEG convention, keeps the 1-bit
    flush padding undecodable). Returns (BITS[16], VALS, code map)."""
    seen: dict[int, int] = {}

    def count_sym(sym: int) -> None:
        seen[sym] = seen.get(sym, 0) + 1

    def drop_bits(value: int, n: int) -> None:
        pass

    emit_scan((count_sym, drop_bits))
    vals = sorted(seen)
    length = 1
    while (1 << length) < len(vals) + 1:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals, _huff_codes(bits, vals)


def _quantize_plane(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(8k, 8m) sample plane → (k, m, 64) quantized zigzag coefficients —
    shared by the progressive encoder and test fixture builders."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    arr = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = DCT_M @ (blk - 128.0) @ DCT_M.T
            arr[by, bx] = np.round(coef / qt).astype(np.int64).flatten()[ZIGZAG]
    return arr
