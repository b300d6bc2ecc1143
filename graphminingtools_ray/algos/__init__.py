from .common import collect_vertex_ids, out_degrees, edges_digest
from .pagerank import pagerank
from .components import connected_components
from .wl import wl_relabel
from .triangles import triangle_counts

__all__ = [
    "collect_vertex_ids",
    "out_degrees",
    "edges_digest",
    "pagerank",
    "connected_components",
    "wl_relabel",
    "triangle_counts",
]
