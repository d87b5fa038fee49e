"""Multimodal (binary-column) operators: decode / feature-extract / CV
kernels as Arrow-batched pandas UDFs over `mapInPandas`.

Reference semantics re-expressed:
  - dimension inference from pixels (base/mask.py:103 — cv2.imread + shape)
    → `decode_image_meta`: real pure-Python PNG header parse (the PNG IHDR
    chunk is bytes 16..24 of the file, public spec); other formats need a
    codec library that is NOT in this container, so they go through the
    clearly-marked stub path below.
  - mask → per-label tight bbox (A6: instance_mask/model.py:104-107) and
    contour-based instance boxes (A7: bbox/model.py:381-390) → `mask_to_bboxes`,
    REAL for PNG payloads via the pure-Python codec in png_codec.py (the
    reference's masks are PNGs — base/mask.py:83-103).
  - merge-recolor of mask pixels (base/mask.py:189-236, with quirk #6's
    random merged color replaced by a deterministic hash-derived color) →
    `recolor_masks`, REAL for PNG (decode → palette rewrite → re-encode).
  - nearest-neighbor mask/image resize → `resize_images`, REAL for PNG.

Round 4: baseline JPEG decode is REAL too (jpeg_codec.py — pure-Python
ITU-T T.81 baseline DCT + Annex K Huffman, PSNR-verified round-trips),
covering the .jpg imagery the reference fetches (io_utils.py:15-41).
Round 5: progressive JPEG (SOF2) decode is REAL as well — T.81 §G.1.2
spectral-selection + successive-approximation scans, parity-tested
against the baseline decode on synthesized progressive fixtures.

STUB CONTRACT (beyond PNG + JPEG): video and
model-based extraction still need codec/model runtimes absent from this
container. Pass
`fake=True` to run a deterministic md5-derived fake (stable across
engines/runs — usable in tests and benchmarks); with `fake=False` a
non-PNG payload raises NotImplementedError naming the dependency. Batch
shape, schemas and partitioning are identical either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_dimensions(content: bytes) -> tuple[int, int] | None:
    """Width/height from the IHDR chunk (public PNG spec) — no codec
    needed; returns None for non-PNG payloads."""
    if len(content) < 24 or content[:8] != PNG_MAGIC:
        return None
    w, h = struct.unpack(">II", content[16:24])
    return int(w), int(h)


def _decode_pixels(content: bytes, fake: bool):
    """The codec hook → uint8 ndarray (h, w) or (h, w, C).

    PNG decodes for real through the pure-Python codec (png_codec.py);
    other formats would need cv2/PIL, which this container lacks — they
    raise NotImplementedError unless ``fake`` requests the deterministic
    digest-derived stand-in."""
    import numpy as np

    if fake:
        # deterministic fake: 4x4 'pixels' derived from the content digest
        digest = hashlib.md5(content).digest()
        return np.array(
            [[digest[(r * 4 + c) % 16] for c in range(4)] for r in range(4)],
            dtype=np.uint8,
        )
    if content[:8] == PNG_MAGIC:
        from jigsaw_spark.multimodal.png_codec import decode_png

        return decode_png(content)
    if content[:2] == b"\xff\xd8":
        from jigsaw_spark.multimodal.jpeg_codec import decode_jpeg

        return decode_jpeg(content)
    raise NotImplementedError(
        "pixel decode beyond PNG/baseline-JPEG requires an image codec "
        "(cv2 or PIL); PNG decodes via multimodal/png_codec.py, baseline "
        "JPEG via multimodal/jpeg_codec.py"
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """(image_id, kind, path, length, content) → + (format, width, height).

    PNG and JPEG dims come from real header parses (PNG IHDR; JPEG SOF
    marker walk — both stdlib-only, no pixel decode needed); other formats
    yield NULLs (they need the codec hook). Pure projection over Arrow
    batches — no shuffle, scales linearly."""

    schema = (
        "image_id string, kind string, path string, length long, "
        "format string, width int, height int"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for content in pdf["content"]:
                b = bytes(content)
                dims = png_dimensions(b)
                if dims:
                    fmts.append("png")
                    ws.append(dims[0])
                    hs.append(dims[1])
                elif b[:3] == b"\xff\xd8\xff":
                    from jigsaw_spark.multimodal.png_codec import jpeg_dimensions

                    jd = jpeg_dimensions(b)
                    fmts.append("jpeg")
                    ws.append(jd[0] if jd else None)
                    hs.append(jd[1] if jd else None)
                else:
                    fmts.append("unknown")
                    ws.append(None)
                    hs.append(None)
            out = pdf[["image_id", "kind", "path", "length"]].copy()
            out["format"] = fmts
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            yield out

    return df.mapInPandas(op, schema)


def mask_to_bboxes(df: DataFrame, fake: bool = False) -> DataFrame:
    """A6/A7: per-label tight bounding boxes from mask pixels, exploded to
    a child table (image_id, label_r, label_g, label_b, xmin, xmax, ymin,
    ymax). REAL for PNG masks (the reference's format — base/mask.py:83-103,
    tight-extent semantics of instance_mask/model.py:104-107); non-PNG
    payloads go through the stub contract (`fake=True` or raise)."""

    schema = (
        "image_id string, label_r int, label_g int, label_b int, "
        "xmin int, xmax int, ymin int, ymax int"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for image_id, content in zip(pdf["image_id"], pdf["content"]):
                arr = np.asarray(_decode_pixels(bytes(content), fake))
                # normalize to (h, w, 3): gray → replicated triple (matches
                # the reference treating single-channel masks as gray RGB);
                # alpha is not a label channel and is dropped
                if arr.ndim == 2:
                    rgb = np.repeat(arr[:, :, None], 3, axis=2)
                elif arr.shape[2] >= 3:
                    rgb = arr[:, :, :3]
                else:  # gray+alpha
                    rgb = np.repeat(arr[:, :, :1], 3, axis=2)
                packed = (
                    (rgb[:, :, 0].astype(np.int32) << 16)
                    | (rgb[:, :, 1].astype(np.int32) << 8)
                    | rgb[:, :, 2].astype(np.int32)
                )
                # tight extent per distinct color, vectorized per label
                # (np.unique is sorted → deterministic child-row order)
                for u in np.unique(packed):
                    ys, xs = np.nonzero(packed == u)
                    rows.append(
                        {
                            "image_id": image_id,
                            "label_r": int(u >> 16) & 0xFF,
                            "label_g": int(u >> 8) & 0xFF,
                            "label_b": int(u) & 0xFF,
                            "xmin": int(xs.min()),
                            "xmax": int(xs.max()),
                            "ymin": int(ys.min()),
                            "ymax": int(ys.max()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id",
                    "label_r",
                    "label_g",
                    "label_b",
                    "xmin",
                    "xmax",
                    "ymin",
                    "ymax",
                ],
            )

    return df.mapInPandas(op, schema)


def recolor_masks(df: DataFrame, recode: dict, fake: bool = False) -> DataFrame:
    """K11 merge-recolor: rewrite mask pixels whose color maps through
    `recode` {(r,g,b) -> (r,g,b)} and re-encode — REAL for PNG masks
    (decode → vectorized palette rewrite → encode; reference semantics
    base/mask.py:189-236, with quirk #6's random merged color replaced by
    the caller's deterministic mapping). `recolored` reports whether any
    pixel actually changed. Map-only Arrow kernel — no shuffle."""

    schema = "image_id string, kind string, path string, content binary, recolored boolean"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            contents, flags = [], []
            for content in pdf["content"]:
                b = bytes(content)
                arr = np.asarray(_decode_pixels(b, fake))
                if fake:
                    # stub path: geometry-free flag semantics (legacy)
                    contents.append(b)
                    flags.append(bool(recode))
                    continue
                if arr.ndim == 2:
                    rgb = np.repeat(arr[:, :, None], 3, axis=2).copy()
                else:
                    rgb = arr[:, :, :3].copy()
                changed = False
                for (r, g, bb), (r2, g2, b2) in recode.items():
                    m = (
                        (rgb[:, :, 0] == r)
                        & (rgb[:, :, 1] == g)
                        & (rgb[:, :, 2] == bb)
                    )
                    if m.any():
                        rgb[m] = (r2, g2, b2)
                        changed = True
                if changed:
                    from jigsaw_spark.multimodal.png_codec import encode_png

                    contents.append(encode_png(rgb))
                else:
                    contents.append(b)
                flags.append(changed)
            out = pdf[["image_id", "kind", "path"]].copy()
            out["content"] = contents
            out["recolored"] = flags
            yield out

    return df.mapInPandas(op, schema)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Feature extraction over binary content → array<float>. STUB: the
    fake derives a stable unit-norm vector from the md5 digest (usable by
    the similarity operators downstream); real extraction would plug a
    model runtime into the same batch shape."""

    schema = "image_id string, kind string, embedding array<float>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for content in pdf["content"]:
                if not fake:
                    raise NotImplementedError(
                        "feature extraction requires a model runtime; "
                        "use fake=True for the deterministic stub"
                    )
                digest = hashlib.md5(bytes(content)).digest()
                raw = [digest[i % 16] / 255.0 - 0.5 for i in range(dim)]
                norm = sum(x * x for x in raw) ** 0.5 or 1.0
                embs.append([x / norm for x in raw])
            out = pdf[["image_id", "kind"]].copy()
            out["embedding"] = embs
            yield out

    return df.mapInPandas(op, schema)


def _decode_frames(content: bytes, every_n: int, fake: bool):
    """Codec hook for video: yield (frame_idx, frame_bytes) for every Nth
    frame. Real decoders (pyav/ffmpeg/cv2.VideoCapture) are not in this
    container."""
    if fake:
        # deterministic fake: frame count derived from the digest, frame
        # payload = md5(content || idx) — stable across engines/runs
        digest = hashlib.md5(content).digest()
        n_frames = 8 + digest[0] % 8
        for idx in range(0, n_frames, every_n):
            yield idx, hashlib.md5(content + idx.to_bytes(4, "big")).digest()
        return
    raise NotImplementedError(
        "frame decode requires a video codec (pyav or ffmpeg); wire it into "
        "jigsaw_spark.multimodal.binary_ops._decode_frames"
    )


def sample_frames(df: DataFrame, every_n: int = 4, fake: bool = False) -> DataFrame:
    """Video frame sampling: (video_id, content) → exploded child table
    (video_id, frame_idx, frame). One input row fans out to ~frames/every_n
    output rows INSIDE the Arrow batch — no Spark-side explode, no shuffle;
    downstream per-frame ops (decode_image_meta, extract_features) compose
    directly. At scale, partition count = input file count; repartition
    upstream if videos are few-but-huge so each task holds O(1) videos."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for vid, content in zip(pdf["video_id"], pdf["content"]):
                for idx, frame in _decode_frames(bytes(content), every_n, fake):
                    ids.append(vid)
                    idxs.append(idx)
                    frames.append(frame)
            yield pd.DataFrame(
                {"video_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(op, "video_id string, frame_idx int, frame binary")


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """(image_id, content) → (image_id, width, height, resized) — the
    normalize-resolution step before feature extraction. REAL for PNG:
    decode → nearest-neighbor resample (label-preserving, the right choice
    for masks) → re-encode. Non-PNG keeps the stub contract (deterministic
    digest payload under ``fake``, NotImplementedError otherwise)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for content in pdf["content"]:
                b = bytes(content)
                if fake:
                    seed = hashlib.md5(
                        b + width.to_bytes(2, "big") + height.to_bytes(2, "big")
                    ).digest()
                    outs.append(seed * ((width * height) // len(seed) + 1))
                elif b[:8] == PNG_MAGIC:
                    from jigsaw_spark.multimodal.png_codec import (
                        decode_png,
                        encode_png,
                        resize_nearest,
                    )

                    outs.append(encode_png(resize_nearest(decode_png(b), width, height)))
                else:
                    raise NotImplementedError(
                        "non-PNG resize requires a raster codec (cv2 or PIL); "
                        "PNG resizes natively via multimodal/png_codec.py"
                    )
            out = pdf[["image_id"]].copy()
            out["width"] = width
            out["height"] = height
            out["resized"] = outs
            yield out

    return df.mapInPandas(
        op, "image_id string, width int, height int, resized binary"
    )


def _label_regions(packed, background: int = 0):
    """Connected-component labeling of a packed-color grid (4-connectivity)
    — the codec-free analog of the reference's GaussianBlur+findContours
    instance separation (reference: jigsaw/models/bbox/model.py:381-390).

    Run-based two-pass union-find: each scanline decomposes into maximal
    same-color runs (one np.diff per row), runs union with overlapping
    same-color runs of the previous row — O(runs), not O(pixels·instances),
    so a 960×720 mask labels in milliseconds without cv2/scipy. Returns
    (labels int64 grid, n_instances); background pixels get label -1."""
    import numpy as np

    h, w = packed.shape
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    labels = np.full((h, w), -1, dtype=np.int64)
    prev_runs: list[tuple[int, int, int, int]] = []
    for y in range(h):
        row = packed[y]
        bounds = np.nonzero(np.diff(row))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [w]))
        cur_runs = []
        for s, e in zip(starts, ends):
            v = int(row[s])
            if v == background:
                continue
            lab = len(parent)
            parent.append(lab)
            for ps, pe, pv, pl in prev_runs:
                if pv == v and ps < e and s < pe:
                    union(lab, pl)
            cur_runs.append((int(s), int(e), v, lab))
            labels[y, s:e] = lab
        prev_runs = cur_runs
    # resolve to dense instance ids in first-appearance (root) order —
    # vectorized LUT over the run labels, no per-pixel Python loop
    roots = sorted({find(i) for i in range(len(parent))})
    remap = {r: i for i, r in enumerate(roots)}
    if parent:
        lut = np.array([remap[find(i)] for i in range(len(parent))], dtype=np.int64)
        flat = labels.ravel()
        mask = flat >= 0
        flat[mask] = lut[flat[mask]]
    return labels, len(roots)


def mask_to_instance_bboxes(df: DataFrame, fake: bool = False) -> DataFrame:
    """A7 REAL: per-INSTANCE tight bounding boxes — disjoint regions of the
    same color become separate rows (unlike `mask_to_bboxes`, which merges
    them into one per-color extent). Child table: (image_id, label_r/g/b,
    instance_id, xmin, xmax, ymin, ymax, area). Background (0,0,0) is not
    an instance. instance_id is ordered by (ymin, xmin, color) — raster
    order, deterministic under any partitioning. Map-only Arrow kernel."""
    schema = (
        "image_id string, label_r int, label_g int, label_b int, "
        "instance_id int, xmin int, xmax int, ymin int, ymax int, area long"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for image_id, content in zip(pdf["image_id"], pdf["content"]):
                arr = np.asarray(_decode_pixels(bytes(content), fake))
                if arr.ndim == 2:
                    rgb = np.repeat(arr[:, :, None], 3, axis=2)
                elif arr.shape[2] >= 3:
                    rgb = arr[:, :, :3]
                else:
                    rgb = np.repeat(arr[:, :, :1], 3, axis=2)
                packed = (
                    (rgb[:, :, 0].astype(np.int32) << 16)
                    | (rgb[:, :, 1].astype(np.int32) << 8)
                    | rgb[:, :, 2].astype(np.int32)
                )
                labels, n = _label_regions(packed, background=0)
                inst = []
                for i in range(n):
                    ys, xs = np.nonzero(labels == i)
                    v = int(packed[ys[0], xs[0]])
                    inst.append(
                        (
                            int(ys.min()),
                            int(xs.min()),
                            v,
                            int(xs.max()),
                            int(ys.max()),
                            int(len(ys)),
                        )
                    )
                inst.sort()
                for iid, (y0, x0, v, x1, y1, area) in enumerate(inst):
                    rows.append(
                        {
                            "image_id": image_id,
                            "label_r": (v >> 16) & 0xFF,
                            "label_g": (v >> 8) & 0xFF,
                            "label_b": v & 0xFF,
                            "instance_id": iid,
                            "xmin": x0,
                            "xmax": x1,
                            "ymin": y0,
                            "ymax": y1,
                            "area": area,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id",
                    "label_r",
                    "label_g",
                    "label_b",
                    "instance_id",
                    "xmin",
                    "xmax",
                    "ymin",
                    "ymax",
                    "area",
                ],
            )

    return df.mapInPandas(op, schema)


def phash_dhash(df: DataFrame) -> DataFrame:
    """(image_id, content) → (image_id, byte_idx, byte_val): difference
    hash (dHash) in LONG FORM — one row per hash byte.

    Pipeline per image, all integer arithmetic (engine-replayable):
    decode PNG (real pixels, png_codec) → integer luma
    ``(299r + 587g + 114b) // 1000`` → nearest-neighbor resize to 9x8
    (``src = dst * src_dim // dst_dim``, same math as resize_nearest) →
    bit(y, x) = 1 iff px[y][x] < px[y][x+1] → byte y = sum(bit << x).

    The long form is deliberate: each of the 8 bytes is an LSH band for
    Hamming near-dup search — two hashes within Hamming distance 6 must
    agree on at least two full bytes (pigeonhole: 8 bands, ≤6 differing
    bits), so a (byte_idx, byte_val) equi-join finds every ≤6-bit pair
    without an all-pairs scan. It also keeps cells scalar for the
    correctness canon (a 64-bit hash with bit 63 set would not fit a
    signed BIGINT).

    Map-only Arrow kernel; ~8 output rows per image.
    """
    import numpy as np

    from jigsaw_spark.multimodal.png_codec import decode_png, resize_nearest

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[str] = []
            bidx: list[int] = []
            bval: list[int] = []
            for iid, content in zip(pdf["image_id"], pdf["content"]):
                arr = decode_png(bytes(content))
                a = np.asarray(arr, dtype=np.int64)
                if a.ndim == 3:
                    g = (
                        299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]
                    ) // 1000
                else:
                    g = a
                small = resize_nearest(g, 9, 8)
                for y in range(8):
                    v = 0
                    for x in range(8):
                        if small[y, x] < small[y, x + 1]:
                            v |= 1 << x
                    ids.append(iid)
                    bidx.append(y)
                    bval.append(v)
            yield pd.DataFrame(
                {"image_id": ids, "byte_idx": bidx, "byte_val": bval}
            )

    return df.mapInPandas(op, "image_id string, byte_idx int, byte_val int")


def gaussian_blur5(plane):
    """OpenCV-equivalent ``GaussianBlur(src, (5,5), 0)`` on a uint8 plane,
    pure numpy. For sigma=0 and ksize=5 OpenCV's getGaussianKernel uses
    its FIXED small-kernel table [0.0625, 0.25, 0.375, 0.25, 0.0625] =
    [1,4,6,4,1]/16 (binomial), with BORDER_REFLECT_101 edges and
    fixed-point accumulation: the combined 5x5 weights sum to 256 and
    the result is (acc + 128) >> 8 — reproduced here exactly, so the
    blur matches cv2 bit-for-bit without the dependency (reference:
    jigsaw/models/bbox/model.py:384)."""
    import numpy as np

    k = np.array([1, 4, 6, 4, 1], dtype=np.int64)
    # reflect-101 pad: edge pixel not duplicated (OpenCV BORDER_DEFAULT)
    p = np.pad(plane.astype(np.int64), 2, mode="reflect")
    h, w = plane.shape
    acc = np.zeros((h, w + 4), dtype=np.int64)
    for i, kv in enumerate(k):  # vertical pass (unnormalized)
        acc += kv * p[i : i + h, :]
    out = np.zeros((h, w), dtype=np.int64)
    for j, kv in enumerate(k):  # horizontal pass
        out += kv * acc[:, j : j + w]
    return ((out + 128) >> 8).astype(np.uint8)


def segment_by_instance_blurred(plane):
    """The reference's ``segment_by_instance`` (model.py:381-390) without
    cv2: GaussianBlur(5x5, sigma=0) on the single-label binary mask,
    then external components of the blurred nonzero support, then
    bounding rects in the cv2 convention (xmax/ymax EXCLUSIVE: x+w,
    y+h). The blur is the noise-smoothing step the plain CCL variant
    lacks — anti-aliased or 1-4px-fragmented instances merge into one
    box exactly as the cv2 pipeline merges them. Returns
    [{'xmin','xmax','ymin','ymax'}] in raster order of the component's
    topmost-leftmost pixel."""
    import numpy as np

    blurred = gaussian_blur5(plane)
    support = (blurred > 0).astype(np.int32)
    labels, n = _label_regions(support, background=0)
    out = []
    for i in range(n):
        ys, xs = np.nonzero(labels == i)
        out.append(
            {
                "xmin": int(xs.min()),
                "xmax": int(xs.max()) + 1,
                "ymin": int(ys.min()),
                "ymax": int(ys.max()) + 1,
            }
        )
    out.sort(key=lambda b: (b["ymin"], b["xmin"]))
    return out
