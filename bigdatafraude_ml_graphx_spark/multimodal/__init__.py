from .binary import (  # noqa: F401
    MEDIA_META_SCHEMA,
    as_media,
    byte_stats,
    byte_histogram_features,
    decode_image,
    decode_raw8,
    encode_raw8,
    resize_image,
    resize_raw8,
    sample_frames,
)
