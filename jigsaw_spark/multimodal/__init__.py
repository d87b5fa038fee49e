from jigsaw_spark.multimodal.binary_ops import (
    decode_image_meta,
    extract_features,
    mask_to_bboxes,
    recolor_masks,
)

__all__ = [
    "decode_image_meta",
    "extract_features",
    "mask_to_bboxes",
    "recolor_masks",
]
