from .deterministic import dsum, davg, dstddev_samp  # noqa: F401
