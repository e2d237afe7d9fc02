from .deterministic import dsum, davg, dstddev_samp  # noqa: F401
from .text import (  # noqa: F401
    normalize_text,
    tokens,
    token_count,
    punct_ratio,
    lang_guess,
    quality_score,
    fingerprint,
)
from .redaction import redact_pii, pii_hits  # noqa: F401
from .repetition import repetition_metrics  # noqa: F401
from .tfidf import tfidf_top_terms  # noqa: F401
