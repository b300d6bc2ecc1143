from .pagerank import pagerank
from .components import connected_components
from .labelprop import label_propagation
from .wl import wl_relabel
from .triangles import triangle_counts

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "wl_relabel",
    "triangle_counts",
]
