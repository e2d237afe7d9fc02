"""Property-based checks for corpus-preparation operators: chunking
conserves and reassembles the exact token stream for ARBITRARY text (unicode,
punctuation runs, whitespace pathologies), and scalar quantization's
round-trip error stays under one quantization step for arbitrary vectors.
One Spark job per example, so examples are few but adversarially shrunk.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.operators.chunking import chunk_documents
from bigdatafraude_ml_graphx_spark.similarity.quantize import (
    dequantize,
    scalar_quantize,
)

_texts = st.lists(
    st.text(max_size=120),  # arbitrary unicode incl. empty / punct-only
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None)
@given(texts=_texts, k=st.integers(1, 7))
def test_chunking_reassembles_token_stream(spark, texts, k):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    from bigdatafraude_ml_graphx_spark.functions.text import tokens

    expected = {
        r["doc_id"]: r["toks"]
        for r in df.select("doc_id", tokens("text").alias("toks")).collect()
    }
    chunks = chunk_documents(df, chunk_tokens=k).collect()
    got: dict[int, list[str]] = {}
    for r in sorted(chunks, key=lambda r: (r["doc"], r["chunk_id"])):
        assert 1 <= r["n_chunk_tokens"] <= k
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert len(toks) == r["n_chunk_tokens"]
        got.setdefault(r["doc"], []).extend(toks)
    for doc_id, toks in expected.items():
        assert got.get(doc_id, []) == list(toks)  # exact stream, exact order


_vecs = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=12, deadline=None)
@given(vecs=_vecs)
def test_quantize_roundtrip_error_bound(spark, vecs):
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    rows = (
        dequantize(scalar_quantize(df))
        .select(
            "vec_id",
            "qvec",
            (F.col("qvec_max") - F.col("qvec_min")).alias("rng"),
            F.array_max(
                F.zip_with("dqvec", "embedding", lambda a, b: F.abs(a - b))
            ).alias("err"),
        )
        .collect()
    )
    for r in rows:
        assert all(0 <= c <= 255 for c in r["qvec"])
        step = r["rng"] / 255.0
        # one-step bound with float slack; degenerate range -> exact
        assert r["err"] <= step + 1e-9 * max(1.0, abs(r["rng"])) or math.isclose(
            r["err"], 0.0, abs_tol=1e-12
        )
