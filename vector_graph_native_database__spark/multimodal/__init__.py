from .columns import (
    attach_binary,
    byte_histogram_features,
    fake_decode_image_meta,
    frame_sample,
    resize_plan,
    FEATURES_SCHEMA,
    IMAGE_META_SCHEMA,
)

__all__ = [
    "attach_binary",
    "byte_histogram_features",
    "fake_decode_image_meta",
    "frame_sample",
    "resize_plan",
    "FEATURES_SCHEMA",
    "IMAGE_META_SCHEMA",
]
