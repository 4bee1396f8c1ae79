from raygraph.algos.pagerank import pagerank, ConvergenceError  # noqa: F401
from raygraph.algos.components import weakly_connected_components  # noqa: F401
from raygraph.algos.labelprop import label_propagation  # noqa: F401
