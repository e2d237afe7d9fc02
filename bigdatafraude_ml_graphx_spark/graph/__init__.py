from .bfs import shortest_paths  # noqa: F401
from .builders import cooccurrence_edges, symmetrize  # noqa: F401
from .degrees import degrees, in_degrees, out_degrees  # noqa: F401
from .components import connected_components, connected_components_star  # noqa: F401
from .pagerank import pagerank  # noqa: F401
from .api import PropertyGraph  # noqa: F401
from .pagerank import normalize_weights  # noqa: F401
from .triangles import triangle_count, orient_by_degree, wedges  # noqa: F401
