"""Round-10 batch: hot-content-safe dedup configs (document-frequency caps).

The uncapped inverted-index pair finders (q27 Jaccard, q232 containment)
are exact and answer-size-bound on natural corpora — but a boilerplate
block shared by 2/3 of documents makes the ANSWER itself quadratic (every
boilerplate-sharing pair crosses the threshold), which no plan can bound.
The production response is the document-frequency cap the operator
docstrings have always named ("a shingle shared by thousands of docs
carries no near-dup signal but quadratic join cost"): these queries
certify the CAPPED configs exactly — the DuckDB oracle mirrors the cap, so
the semantics ("similarity over the df-capped shingle universe") are
pinned value-by-value, and the hot-content sf1.0 fixture
(tools/make_sf1_hotcontent.py) proves the wall-clock stays bounded where
the uncapped forms blow up.

The cap is RELATIVE — shingles in more than ``_DF_FRAC`` (2%) of documents
are dropped — because an absolute count means different things at
different corpus sizes: df=100 is boilerplate in a 500-doc corpus and a
merely-common phrase in a 50M-doc one. Both engines compute the threshold
as the same double product (0.02 · N), so the boundary document count is
bit-identical.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .queries_text import _SHINGLES_CTE

_DF_FRAC = 0.02


def _capped_shingles_cte() -> str:
    """Shingle stream restricted to shingles in ≤ _DF_FRAC·|docs| documents
    — the exact SQL mirror of ``max_shingle_freq`` (df over the DISTINCT
    (doc, shingle) stream = document frequency)."""
    return f"""{_SHINGLES_CTE},
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(*) <= {_DF_FRAC} * (SELECT COUNT(*) FROM documents)),
    shc AS (SELECT sh.doc, sh.shingle FROM sh JOIN keep USING (shingle))
    """


@query(
    "q233_jaccard_df_capped",
    oracle=f"""
    WITH {_capped_shingles_cte()},
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM shc GROUP BY doc),
    shared AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
               FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE)
             AS jaccard
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc
    JOIN sizes sb ON s.doc_b = sb.doc
    WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE)
          >= 0.04
    """,
)
def q233_jaccard_df_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q27's n-gram Jaccard in the boilerplate-safe production config:
    shingles appearing in more than 2% of documents are dropped before
    the inverted-index self-join, and Jaccard is computed over the capped
    universe (sizes shrink too — both engines agree bit-for-bit). On the
    hot-content fixture (2/3 of docs share one boilerplate block) the cap
    is the difference between a bounded join and B·(B−1)/2 rows per
    boilerplate shingle. The extra corpus count is one dim-light scan
    (doc_id only), amortized at 100 TB by catalog row-count statistics."""
    from .dedup.ngram import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    cap = _DF_FRAC * docs.count()
    return ngram_jaccard_pairs(
        docs, n=3, threshold=0.04, max_shingle_freq=cap
    )


@query(
    "q234_containment_df_capped",
    oracle=f"""
    WITH {_capped_shingles_cte()},
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM shc GROUP BY doc),
    shared AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
               FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS c_a_in_b,
           CAST(s.shared AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS c_b_in_a
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc
    JOIN sizes sb ON s.doc_b = sb.doc
    WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= 0.5
       OR CAST(s.shared AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) >= 0.5
    """,
)
def q234_containment_df_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q232's asymmetric containment in the boilerplate-safe production
    config (2%-of-corpus df cap). The cap matters MORE here than for
    Jaccard: a shared boilerplate block pushes a short doc's containment
    toward 1 by itself, so on a boilerplate-heavy corpus the uncapped
    answer — not just the join — goes quadratic. Containment over the
    df-capped universe keeps the subset-duplicate signal (a doc genuinely
    embedded in another shares its RARE shingles too) and drops the
    degenerate mass."""
    from .dedup.ngram import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    cap = _DF_FRAC * docs.count()
    return containment_pairs(
        docs, n=3, threshold=0.5, max_shingle_freq=cap
    )


def _oracle_srp_pairs_capped() -> str:
    """q229's SRP oracle with a relative bucket cap mirrored in SQL:
    (band, bval) buckets holding more than _DF_FRAC·|vectors| rows are
    dropped before the candidate self-join."""
    from .queries_corpus import _SRP32_BANDS, _SRP32_SIGNS, _SRP_DIM, _SRP_TAU
    from .similarity.srp import oracle_srp_signature_sql

    signs, n_bands, tau, dim = _SRP32_SIGNS, _SRP32_BANDS, _SRP_TAU, _SRP_DIM
    bw = len(signs) // n_bands
    mask = (1 << bw) - 1
    bands = ", ".join(str(b) for b in range(n_bands))
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> sa.q[i] * sb.q[i]))"
    na = f"list_sum(list_transform(range(1, {dim + 1}), i -> sa.q[i] * sa.q[i]))"
    nb = f"list_sum(list_transform(range(1, {dim + 1}), i -> sb.q[i] * sb.q[i]))"
    return f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(range(1, {dim + 1}),
                 i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                           AS BIGINT)) AS q,
             {oracle_srp_signature_sql(signs)} AS sig
      FROM embeddings
    ), bands AS (
      SELECT vec_id, b AS band, (sig >> (b * {bw})) & {mask} AS bval
      FROM s, UNNEST([{bands}]) AS t(b)
    ), keep AS (
      SELECT band, bval FROM bands GROUP BY band, bval
      HAVING COUNT(*) <= {_DF_FRAC} * (SELECT COUNT(*) FROM embeddings)
    ), bandsc AS (
      SELECT bands.* FROM bands JOIN keep USING (band, bval)
    ), cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM bandsc a JOIN bandsc b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, cosine_q FROM (
      SELECT a_id, b_id,
             CAST({dot} AS DOUBLE)
               / sqrt(CAST({na} AS DOUBLE))
               / sqrt(CAST({nb} AS DOUBLE)) AS cosine_q
      FROM cand JOIN s sa ON sa.vec_id = a_id JOIN s sb ON sb.vec_id = b_id)
    WHERE cosine_q >= {tau}
    """


@query("q235_srp_pairs_bucket_capped", oracle=_oracle_srp_pairs_capped())
def q235_srp_pairs_bucket_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q229's production SRP near-pair sweep with the bucket cap made
    CORPUS-RELATIVE (2% of vectors, vs the inert absolute 100k default):
    a bucket holding more than 2% of the corpus is degenerate mass by
    definition — no 2%-of-corpus set is "near duplicates of each other"
    in a deduplicated production corpus; it is a collapsed cluster (the
    hot-content fixture: 2/3 of vectors moved onto one point, whose
    uncapped candidate set is ~9·10⁷ pairs at a mere 20k vectors).
    Certified exactly (the oracle mirrors the cap); on natural testdata
    the cap may bind on real clusters — the answer is then "pairs whose
    bucket is non-degenerate on every colliding band", which both engines
    agree on bit-for-bit."""
    from .queries_corpus import _SRP32_BANDS, _SRP32_SIGNS, _SRP_TAU
    from .similarity.srp import srp_banded_pairs

    e = load_table(spark, sf_dir, "embeddings")
    cap = _DF_FRAC * e.count()
    return srp_banded_pairs(
        e, "vec_id", "embedding", _SRP32_SIGNS,
        n_bands=_SRP32_BANDS, min_cosine=_SRP_TAU, bucket_cap=cap,
    )


# ---------------------------------------------------------------------------
# q236 — STREAMING incremental-ingest dedup (q231's production daily loop)
# ---------------------------------------------------------------------------

_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _staged_docs_dir(sf_dir: str) -> str:
    """File-stream staging dir for documents.parquet (the events-stream
    symlink trick — streaming/events.py:_staged_dir — applied to the
    documents table; read-only testdata is never touched)."""
    import hashlib

    key = hashlib.md5(f"docs|{sf_dir}".encode()).hexdigest()[:8]
    d = f"/tmp/spark_graft_stream_docs_{key}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "documents.parquet")
    target = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    if not os.path.islink(link):
        os.symlink(target, link)
    return d


def _band_rows(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, band_key) rows — the exact banding expressions of
    ``dedup.minhash`` (md5 over '|'-joined per-band minhash strings),
    inlined so the streaming query shares no lineage with the certified
    batch operators. Works identically on batch and streaming frames
    (stateless: one explode, no aggregation)."""
    rows_per_band = num_hashes // bands
    structs = []
    for band in range(bands):
        cols = [
            F.col(f"mh_{i:02d}")
            for i in range(band * rows_per_band, (band + 1) * rows_per_band)
        ]
        structs.append(
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws("|", *[c.cast("string") for c in cols])
                ).alias("band_key"),
            )
        )
    return sigs.select("doc", F.explode(F.array(*structs)).alias("bk")).select(
        "doc",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def _q236_oracle() -> str:
    from .queries_r9 import _probe_oracle

    return _probe_oracle()


@query("q236_stream_ingest_dedup", oracle=_q236_oracle())
def q236_stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q231's incremental-ingest dedup as a REAL Structured Streaming
    pipeline — the shape a daily crawl actually runs: new documents
    arrive as a stream, each micro-batch is probed against the standing
    corpus's banded MinHash index via a stateless STREAM-STATIC equi
    join, and the candidate-pair counts aggregate across batches. The
    streamed result hash-matches q231's batch answer (same md5 hash and
    banding math; the oracle IS q231's oracle) — the stream/batch
    equivalence proof for the ingest-dedup loop.

    The probe-side signature is computed PER ROW (``array_min`` over the
    hashed shingle array — no groupBy), which is what makes the
    pre-aggregation pipeline stateless: a streaming groupBy("doc") before
    a join would be an unsupported multi-stage stateful topology in one
    query. Statelessness costs re-evaluating the shingle expression once
    per hash function inside whole-stage codegen (k=8 passes over a
    ~50-token array per doc); the batch kernel (q231) amortizes that
    through the exploded shuffle instead — at 100 TB the index is a
    stored artifact either way, and the stream side is one day's batch.

    Docs with no trigrams are filtered explicitly (the batch kernel's
    groupBy drops them by construction; the per-row form must match)."""
    from .dedup.minhash import _hash64, minhash_signatures
    from .dedup.ngram import ngrams_from_tokens
    from .functions.text import tokens
    from .streaming.sinks import memory_sink, run_available_now

    num_hashes, bands = 8, 4

    # Standing index: batch signatures, one scan, checkpointed — in
    # production this is a stored artifact updated by each ingest.
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=num_hashes).localCheckpoint(
        eager=True
    )
    index_bands = _band_rows(
        sigs.filter(F.col("doc") % 10 != 0), num_hashes, bands
    ).localCheckpoint(eager=True)

    # Probe stream: per-row stateless signature.
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .parquet(_staged_docs_dir(sf_dir))
        .filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("doc"), tokens("text").alias("_toks"))
        .select("doc", ngrams_from_tokens(F.col("_toks"), 3).alias("_grams"))
        .filter(F.size("_grams") > 0)
    )
    # NOTE: the salt must be bound through a function parameter — a
    # two-argument lambda (`lambda s, _i=i`) would be interpreted by
    # F.transform as its (element, index) form and the array INDEX would
    # silently replace the salt (found the hard way: every signature
    # disagreed with the batch kernel).
    def _mh(salt: int):
        return F.array_min(
            F.transform("_grams", lambda s: _hash64(s, salt))
        ).alias(f"mh_{salt:02d}")

    mh = [_mh(i) for i in range(num_hashes)]
    probe_bands = _band_rows(stream.select("doc", *mh), num_hashes, bands)

    pairs = (
        probe_bands.alias("p")
        .join(
            index_bands.alias("i"),
            (F.col("p.band") == F.col("i.band"))
            & (F.col("p.band_key") == F.col("i.band_key"))
            & (F.col("p.doc") != F.col("i.doc")),
        )
        .groupBy(
            F.col("p.doc").alias("doc_probe"),
            F.col("i.doc").alias("doc_index"),
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )
    name = f"q236_sink_{uuid.uuid4().hex[:8]}"
    q = memory_sink(pairs, name, output_mode="complete", available_now=True)
    run_available_now(q)
    return spark.table(name).select("doc_probe", "doc_index", "n_shared_bands")


# ---------------------------------------------------------------------------
# q237 — incremental ANN ingest (probe batch vs standing SRP index)
# ---------------------------------------------------------------------------

def _oracle_srp_probe() -> str:
    """SRP probe-vs-index oracle: same signature/banding SQL as q229/q235,
    split on vec_id % 10, index-side relative bucket cap."""
    from .queries_corpus import _SRP32_BANDS, _SRP32_SIGNS, _SRP_DIM, _SRP_TAU
    from .similarity.srp import oracle_srp_signature_sql

    signs, n_bands, tau, dim = _SRP32_SIGNS, _SRP32_BANDS, _SRP_TAU, _SRP_DIM
    bw = len(signs) // n_bands
    mask = (1 << bw) - 1
    bands = ", ".join(str(b) for b in range(n_bands))
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> sp.q[i] * si.q[i]))"
    np_ = f"list_sum(list_transform(range(1, {dim + 1}), i -> sp.q[i] * sp.q[i]))"
    ni = f"list_sum(list_transform(range(1, {dim + 1}), i -> si.q[i] * si.q[i]))"
    return f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(range(1, {dim + 1}),
                 i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                           AS BIGINT)) AS q,
             {oracle_srp_signature_sql(signs)} AS sig
      FROM embeddings
    ), bands AS (
      SELECT vec_id, b AS band, (sig >> (b * {bw})) & {mask} AS bval
      FROM s, UNNEST([{bands}]) AS t(b)
    ), keep AS (
      SELECT band, bval FROM bands WHERE vec_id % 10 != 0 GROUP BY band, bval
      HAVING COUNT(*) <= 0.02 * (SELECT COUNT(*) FROM embeddings
                                 WHERE vec_id % 10 != 0)
    ), cand AS (
      SELECT DISTINCT p.vec_id AS id_probe, i.vec_id AS id_index
      FROM bands p
      JOIN bands i ON p.band = i.band AND p.bval = i.bval
      JOIN keep k ON i.band = k.band AND i.bval = k.bval
      WHERE p.vec_id % 10 = 0 AND i.vec_id % 10 != 0
        AND p.vec_id != i.vec_id
    )
    SELECT id_probe, id_index, cosine_q FROM (
      SELECT id_probe, id_index,
             CAST({dot} AS DOUBLE)
               / sqrt(CAST({np_} AS DOUBLE))
               / sqrt(CAST({ni} AS DOUBLE)) AS cosine_q
      FROM cand
      JOIN s sp ON sp.vec_id = id_probe
      JOIN s si ON si.vec_id = id_index)
    WHERE cosine_q >= {tau}
    """


@query("q237_srp_ingest_probe", oracle=_oracle_srp_probe())
def q237_srp_ingest_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN ingest — the embedding-space q231: vectors with
    ``vec_id % 10 = 0`` play a newly embedded batch, probed against the
    standing corpus's SRP-banded index (``similarity.srp_probe_pairs``)
    with exact cosine verification. The 100 TB shape: a day's vectors
    cost batch × collision-rate work against a STORED banded index —
    never index × index (q229/q235 cover the one-time self-pairing).
    The index-side bucket cap is corpus-relative (2% of the index — the
    q235 lesson: absolute caps don't engage at any fixed test scale),
    and the oracle mirrors signature, banding, cap, split, and quantized
    cosine bit-for-bit."""
    from .queries_corpus import _SRP32_BANDS, _SRP32_SIGNS, _SRP_TAU
    from .similarity.srp import srp_probe_pairs

    e = load_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") % 10 == 0)
    index = e.filter(F.col("vec_id") % 10 != 0)
    cap = _DF_FRAC * index.count()
    return srp_probe_pairs(
        index, probe, "vec_id", "embedding", _SRP32_SIGNS,
        n_bands=_SRP32_BANDS, min_cosine=_SRP_TAU, bucket_cap=cap,
    )


# ---------------------------------------------------------------------------
# q238 — per-document duplicate-shingle fraction (dedup diagnostics)
# ---------------------------------------------------------------------------

@query(
    "q238_duplicate_shingle_fraction",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    df AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY shingle)
    SELECT sh.doc,
           CAST(COUNT(*) AS BIGINT) AS n_sh,
           CAST(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM sh JOIN df USING (shingle)
    GROUP BY sh.doc
    """,
)
def q238_duplicate_shingle_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-n-gram fraction — the corpus-level dedup
    DIAGNOSTIC that decides whether near-dup removal is worth running at
    all (the quantity Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", reports per corpus): for each doc,
    the share of its distinct trigrams that appear in at least one OTHER
    position in the corpus. Unlike the pair finders this is LINEAR —
    each (doc, shingle) row joins exactly one document-frequency row, so
    there is no quadratic regime even on boilerplate-heavy data (a hot
    shingle makes its df row hot, which the broadcast/AQE join absorbs;
    posting lists are never self-joined).

    Note df counts (doc, shingle) DISTINCT pairs, so df ≥ 2 means "in ≥2
    documents" — within-doc repetition is q67's repetition metric, not
    this one."""
    from .dedup.ngram import _doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, "text", "doc_id", 3)
    df = sh.groupBy("shingle").agg(F.count("*").alias("c"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_sh"),
            F.sum((F.col("c") >= 2).cast("int")).cast("long").alias("n_dup"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup").cast("double") / F.col("n_sh").cast("double"),
        )
    )
