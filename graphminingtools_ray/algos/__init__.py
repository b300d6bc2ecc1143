from .pagerank import pagerank
from .components import connected_components
from .wl import wl_relabel
from .triangles import triangle_counts

__all__ = [
    "pagerank",
    "connected_components",
    "wl_relabel",
    "triangle_counts",
]
