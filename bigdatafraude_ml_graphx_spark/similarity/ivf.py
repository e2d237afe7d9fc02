"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path for similarity search (north-star: "an IVF or LSH-bucketed variant
as the scale path").

Index build: pick ``n_cells`` deterministic centroids (seeded sample of the
corpus or an MLlib k-means fit), then assign every vector to its nearest
centroid as a PURE PROJECTION: the ≤``n_cells`` centroids are inlined into
the plan as literals and the argmax over their cosine similarities is a
per-row array expression — zero shuffle, zero row blowup. (The previous
formulation — explode via broadcast join then a ``Window.partitionBy(id)``
argmax — shuffled the 16×-exploded corpus; a scale-killer at 100 TB.)
Query: probe the ``n_probe`` nearest cells per query and brute-force only
within those cells — the corpus×query cross product shrinks by
~``n_cells/n_probe``×.

At 100 TB the assignment step writes a bucketed/partitioned table keyed by
``cell`` so probes become partition-pruned scans; here the same plan shape is
exercised end-to-end in memory. Recall is tested against the exact
brute-force answer (tests/test_similarity.py), the standard way ANN quality
is validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cosine import _pos_products, _qsum_array


def _norm(vec) -> object:
    return F.sqrt(_qsum_array(_pos_products(vec, vec)))


def build_ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    method: str = "sample",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(centroids, assigned)``: ``centroids(cell, cvec)`` and the
    corpus with an added ``cell`` column (nearest centroid by cosine).

    ``method='sample'`` picks deterministic corpus vectors as centroids (one
    pass, cheapest). ``method='kmeans'`` trains an MLlib k-means coarse
    quantizer — the standard IVF construction (Jégou et al. 2011): centroids
    track the data distribution, so cells are balanced and probe recall is
    higher at the same ``n_probe``. MLlib k-means is itself distributed
    (k·dim doubles broadcast per iteration), so the build holds at corpus
    scale; train on a hash-sample when even that is too hot.

    EAGER: calling this function executes the centroid build (sample sort /
    k-means fit, plus for small ``n_cells`` a ≤``n_cells``-row metadata
    collect) at CALL time, not when ``assigned`` is consumed — index
    construction is inherently a materialization point. The returned
    ``centroids`` frame is checkpointed/created from the already-computed
    rows, so reusing it does not re-run the build.

    Assignment strategy switches on ``n_cells`` (see ``_INLINE_MAX_CELLS``):
    small indexes inline the centroids as literals (pure projection, zero
    shuffle, bit-deterministic); large indexes (the 4k–65k cells a 100 TB
    index needs) broadcast-join the centroid table and take a ``min(struct)``
    argmin — codegen stays bounded, the corpus never shuffles (broadcast
    join + map-side partial aggregation reduce the n_cells-way blowup back
    to one row per id before the exchange).
    """
    if method == "kmeans":
        centroids = _kmeans_centroids(df, n_cells, vec_col, seed)
    elif method == "sample":
        # Seeded sample keyed on md5(seed || id): the id's string rendering
        # is engine-portable (array→string float rendering is NOT), so a SQL
        # oracle can reproduce the exact centroid set — q49's DuckDB oracle
        # mirrors this ordering verbatim. Tie-broken on id (md5 collisions
        # notwithstanding) for a total order. Cell ids are assigned
        # EXPLICITLY as row_number-1 over the same (md5, id) ordering —
        # never monotonically_increasing_id(), whose contiguity after a
        # limit depends on the physical plan (TakeOrderedAndProject on one
        # partition), an implementation detail a plan change would break.
        # The window runs over the already-limited ≤n_cells rows, so the
        # single-partition sort it implies is index METADATA, not a
        # corpus-scale global window.
        hkey = F.md5(F.concat(F.lit(str(seed)), F.col("_cid").cast("string")))
        centroids = (
            df.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("cvec"))
            .orderBy(hkey, F.col("_cid"))
            .limit(n_cells)
            .withColumn(
                "cell",
                (
                    F.row_number().over(Window.orderBy(hkey, F.col("_cid")))
                    - F.lit(1)
                ).cast("long"),
            )
            .drop("_cid")
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError(f"method must be 'sample' or 'kmeans', got {method!r}")
    corpus = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if n_cells <= _INLINE_MAX_CELLS:
        assigned = corpus.withColumn(
            "cell", _nearest_cell_expr("vec", centroids)
        )
    else:
        assigned = _assign_cells_broadcast(corpus, centroids)
    return centroids, assigned


_INLINE_MAX_CELLS = 64


def _assign_cells_broadcast(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment via broadcast join + struct-min argmin.

    The literal-inlining path evaluates O(n_cells) struct expressions per
    row — elegant at 64 cells, codegen-collapsing at the 4k–65k cells a
    100 TB index needs. Here the centroid table (n_cells · dim doubles — MBs
    even at 65k×128) is broadcast, the corpus×centroid similarities are
    computed join-side, and the argmin reduces map-side (partial agg turns
    n_cells rows/id back into 1 BEFORE the exchange), so the only shuffle is
    one row per corpus id. Tie-break matches the literal path exactly:
    min over struct(-sim, cell). Centroid norms are computed once in the
    broadcast frame with the same quantized arithmetic as :func:`_norm`,
    so both paths produce identical assignments (verified in
    tests/test_similarity.py).
    """
    c = F.broadcast(
        centroids.select(
            F.col("cell").cast("long").alias("cell"),
            "cvec",
            _norm(F.col("cvec")).alias("cnorm"),
        )
    )
    joined = corpus.join(c)
    sim = _qsum_array(_pos_products(F.col("vec"), F.col("cvec"))) / (
        _norm(F.col("vec")) * F.col("cnorm")
    )
    keyed = joined.select(
        "id",
        "vec",
        F.struct((-sim).alias("neg_sim"), F.col("cell").alias("cell")).alias("k"),
    )
    return keyed.groupBy("id").agg(
        # vec is functionally dependent on id (unique corpus ids), so
        # min_by over the same key is deterministic and avoids a join-back
        F.min_by("vec", "k").alias("vec"), F.min("k")["cell"].alias("cell")
    ).select("id", "vec", "cell")


def _nearest_cell_expr(vec, centroids: DataFrame):
    """Nearest-centroid argmax as a single column expression.

    The centroid frame is collected to the driver (≤ n_cells rows — index
    METADATA, like k-means' own ``clusterCenters()``, not a data-path
    collect) and inlined as literals. Centroid norms are precomputed in
    Python with the SAME quantized arithmetic as :func:`_norm` (int64 sums of
    ``floor(x·x·1e12 + 0.5)``), so the inlined constants are bit-identical to
    what the JVM expression would produce. Ties break toward the smallest
    cell id, matching the previous window formulation
    (``orderBy(sim desc, cell asc)``) via ``array_min`` over
    ``struct(-sim, cell)``.
    """
    import math

    from .cosine import _QSCALE

    rows = centroids.select("cell", "cvec").collect()
    if isinstance(vec, str):
        # ONE-SHOT SQL construction (optimization r13): the Column-API loop
        # below issues n_cells·dim ``F.lit`` py4j calls plus per-cell lambda
        # conversions — ~10 s of pure driver time at 16 cells × 64 dims,
        # paid on EVERY build/assign call (q49/q140/q252/q260/q271 and the
        # bench's x_ivf rows). Rendering the identical arithmetic as one
        # SQL string costs one py4j call. Float literals go through
        # repr → CAST(str AS DOUBLE): shortest-roundtrip parsing yields the
        # identical IEEE double the F.lit path embedded, so assignments are
        # bit-for-bit unchanged (value-equality pinned in
        # tests/test_similarity.py::test_nearest_cell_sql_equals_column).
        qs = int(_QSCALE)
        vsql = f"`{vec}`"

        def _qsum_sql(prods: str) -> str:
            return (
                f"CAST(aggregate(transform({prods}, x -> CAST(FLOOR("
                f"x * CAST({qs} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)),"
                f" 0L, (acc, x) -> acc + x) AS DOUBLE)"
                f" / CAST({qs} AS DOUBLE)"
            )

        vnorm_sql = "SQRT(" + _qsum_sql(
            f"zip_with({vsql}, {vsql}, (x, y) -> CAST(x AS DOUBLE)"
            f" * CAST(y AS DOUBLE))"
        ) + ")"
        entries_sql = []
        for r in rows:
            cvals = [float(x) for x in r["cvec"]]
            cnorm = math.sqrt(
                sum(math.floor(x * x * _QSCALE + 0.5) for x in cvals) / _QSCALE
            )
            arr = (
                "array("
                + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in cvals)
                + ")"
            )
            prods = (
                f"zip_with({vsql}, {arr}, (x, y) -> CAST(x AS DOUBLE)"
                f" * CAST(y AS DOUBLE))"
            )
            sim = (
                f"({_qsum_sql(prods)})"
                f" / ({vnorm_sql} * CAST('{cnorm!r}' AS DOUBLE))"
            )
            entries_sql.append(
                f"named_struct('neg_sim', -({sim}),"
                f" 'cell', {int(r['cell'])}L)"
            )
        return F.expr(
            "array_min(array(" + ",".join(entries_sql) + ")).cell"
        )
    vnorm = _norm(vec)
    entries = []
    for r in rows:
        cvals = [float(x) for x in r["cvec"]]
        cnorm = math.sqrt(
            sum(math.floor(x * x * _QSCALE + 0.5) for x in cvals) / _QSCALE
        )
        cvec = F.array(*[F.lit(x) for x in cvals])
        sim = _qsum_array(_pos_products(vec, cvec)) / (vnorm * F.lit(cnorm))
        entries.append(
            F.struct(
                (-sim).alias("neg_sim"),
                F.lit(int(r["cell"])).cast("long").alias("cell"),
            )
        )
    return F.array_min(F.array(*entries))["cell"]


def _kmeans_centroids(
    df: DataFrame, n_cells: int, vec_col: str, seed: int
) -> DataFrame:
    """Train the k-means coarse quantizer and return ``(cell, cvec)``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    spark = df.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    elem = df.schema[vec_col].dataType.elementType.simpleString()
    return spark.createDataFrame(rows, f"cell long, cvec array<{elem}>")


def ivf_topk(
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: each query searches only its ``n_probe`` nearest
    cells. Returns ``(query_id, neighbor_id, cosine, rank)``."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    q_cells = q.join(F.broadcast(centroids)).select(
        "query_id",
        "qvec",
        "cell",
        (
            _qsum_array(_pos_products(F.col("qvec"), F.col("cvec")))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cell").asc()
    )
    probes = (
        q_cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    cand = corpus_assigned.join(probes, "cell").filter(
        F.col("id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        (
            _qsum_array(_pos_products(F.col("vec"), F.col("qvec")))
            / (_norm(F.col("vec")) * _norm(F.col("qvec")))
        ).alias("cosine"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= k
    )


def assign_to_index(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign NEW vectors to an EXISTING coarse quantizer — the ingest
    path of a standing IVF index (q271): today's batch is routed to cells
    without touching the corpus or retraining centroids. Returns ``(id,
    vec, cell)`` with the exact tie-break of the build-time assignment
    (min over struct(−sim, cell)), so a vector ingested today lands in
    the same cell a full rebuild over the grown corpus would give it —
    as long as the centroids themselves are unchanged, which is the
    point of a standing index.

    Cost: |batch| × n_cells similarity evaluations, centroids inlined or
    broadcast (index METADATA) — zero corpus work, zero shuffle beyond
    one row per batch id in the broadcast path."""
    corpus = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    n_cells = centroids.count()  # metadata-sized frame
    if n_cells <= _INLINE_MAX_CELLS:
        return corpus.withColumn(
            "cell", _nearest_cell_expr("vec", centroids)
        )
    return _assign_cells_broadcast(corpus, centroids)
