from .exact import dedup_exact, duplicate_groups  # noqa: F401
from .minhash import minhash_signatures, lsh_candidate_pairs  # noqa: F401
from .ngram import ngram_jaccard_pairs, word_ngrams  # noqa: F401
from .simhash import simhash64, simhash_near_pairs  # noqa: F401
from .contamination import contamination_overlap  # noqa: F401
