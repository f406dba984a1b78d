from .pagerank import pagerank, pagerank_weighted  # noqa: F401
from .components import connected_components  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import triangle_count, triangle_count_sampled  # noqa: F401
from .paths import bfs_distances  # noqa: F401
from .scc import strongly_connected_components  # noqa: F401
