from raygraph.algos.pagerank import pagerank, ConvergenceError  # noqa: F401
from raygraph.algos.components import (  # noqa: F401
    strongly_connected_components,
    weakly_connected_components,
)
from raygraph.algos.labelprop import label_propagation  # noqa: F401
