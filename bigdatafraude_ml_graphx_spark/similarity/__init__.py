from .cosine import cosine_topk, embedding_near_dup_pairs  # noqa: F401
