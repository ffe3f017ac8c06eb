from .columns import (
    attach_binary,
    byte_histogram_features,
    decode_audio_meta,
    decode_image_meta,
    fake_decode_image_meta,
    frame_sample,
    resize_plan,
    sniff_image_meta,
    sniff_wav_meta,
    AUDIO_META_SCHEMA,
    FEATURES_SCHEMA,
    IMAGE_META_SCHEMA,
)

__all__ = [
    "attach_binary",
    "byte_histogram_features",
    "decode_audio_meta",
    "decode_image_meta",
    "fake_decode_image_meta",
    "frame_sample",
    "resize_plan",
    "sniff_image_meta",
    "sniff_wav_meta",
    "AUDIO_META_SCHEMA",
    "FEATURES_SCHEMA",
    "IMAGE_META_SCHEMA",
]
