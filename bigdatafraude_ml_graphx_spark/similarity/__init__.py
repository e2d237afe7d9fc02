from .cosine import cosine_topk, embedding_near_dup_pairs  # noqa: F401
from .ivf import build_ivf_index, ivf_topk  # noqa: F401
from .quantize import scalar_quantize, dequantize  # noqa: F401
