from .binary import (  # noqa: F401
    MEDIA_META_SCHEMA,
    as_media,
    byte_stats,
    byte_histogram_features,
    decode_image,
    resize_image,
    sample_frames,
)
