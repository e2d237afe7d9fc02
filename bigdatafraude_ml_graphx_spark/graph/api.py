"""PropertyGraph — the engine's GraphFrames-shaped facade (SURVEY §2.10 G1).

The reference constructs ``GraphFrame(vertices, edges)`` with string ids
(``/root/reference/notebooks/4_graphx.ipynb:334-344``) and calls
``g.degrees`` / ``g.connectedComponents()`` / ``g.pageRank(...)``. This class
offers the same surface over two plain DataFrames with NO Scala dependency —
every algorithm is the engine's DataFrame-native implementation, so it runs
anywhere PySpark runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .builders import symmetrize
from .components import connected_components
from .degrees import degrees, in_degrees, out_degrees
from .pagerank import normalize_weights, pagerank


class PropertyGraph:
    """A property graph as (vertices, edges) DataFrames.

    ``vertices`` needs an ``id`` column; ``edges`` needs ``src``/``dst`` and
    optionally a ``weight`` column. Extra columns ride along untouched.
    """

    def __init__(self, vertices: DataFrame | None, edges: DataFrame):
        self.vertices = vertices
        self.edges = edges

    @property
    def degrees(self) -> DataFrame:
        return degrees(self.edges)

    @property
    def in_degrees(self) -> DataFrame:
        return in_degrees(self.edges)

    @property
    def out_degrees(self) -> DataFrame:
        return out_degrees(self.edges)

    def connected_components(self, max_iter: int = 30) -> DataFrame:
        """(id, component) labeling; component id = min member id —
        GraphFrames-compatible semantics, checkpointed iteration."""
        return connected_components(
            self.edges, vertices=self.vertices, max_iter=max_iter
        )

    def page_rank(
        self,
        reset_probability: float = 0.15,
        max_iter: int = 5,
        weighted: bool = True,
        normalize: bool = True,
    ) -> DataFrame:
        """Weighted PageRank over the symmetrized edge set — the reference's
        hand-rolled variant (G5) by default; ``weighted=False`` gives the
        uniform-weight behavior of GraphFrames' ``g.pageRank`` (G6)."""
        e = symmetrize(self.edges)
        if not weighted:
            from pyspark.sql import functions as F

            e = e.withColumn("weight", F.lit(1.0))
        if normalize:
            e = normalize_weights(e)
        return pagerank(
            e,
            vertices=self.vertices,
            alpha=reset_probability,
            max_iter=max_iter,
        )
