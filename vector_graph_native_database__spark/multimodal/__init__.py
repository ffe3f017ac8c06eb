from .columns import (
    attach_binary,
    fake_decode_image_meta,
    frame_sample,
    IMAGE_META_SCHEMA,
)

__all__ = [
    "attach_binary",
    "fake_decode_image_meta",
    "frame_sample",
    "IMAGE_META_SCHEMA",
]
