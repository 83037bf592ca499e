from graphit_spark.sources.edgelist import (
    read_edge_list,
    read_weighted_edge_list,
    write_edge_list,
)

__all__ = ["read_edge_list", "read_weighted_edge_list", "write_edge_list"]
