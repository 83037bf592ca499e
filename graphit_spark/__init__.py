"""graphit_spark — a PySpark-native link-graph analytics engine.

A brand-new engine with the query capabilities of GraphIt-DSL/graphit
(reference: /root/reference), built Spark-first on DataFrame/SQL plans:
edge traversals become join + groupBy-aggregation supersteps, GraphIt's
schedule space (push/pull direction, frontier density, deduplication)
becomes driver-side physical-plan choices, and atomics are replaced by
shuffle aggregation.

Public API (the analogue of GraphIt's ``export func`` pybind surface,
reference apps/python_bindings/pagerank_delta/pagerank_delta_export.gt):

    from graphit_spark import get_spark, LinkGraph
    from graphit_spark.kernels import pagerank, connected_components, ...
"""

from graphit_spark.session import get_spark
from graphit_spark.graph import LinkGraph
from graphit_spark.checkpoint import SnapshotStore

__version__ = "0.1.0"

__all__ = ["get_spark", "LinkGraph", "SnapshotStore", "__version__"]
