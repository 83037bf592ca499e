from graphit_spark.sources.edgelist import (
    read_edge_list,
    read_weighted_edge_list,
    write_edge_list,
)
from graphit_spark.sources.partitioned import (
    read_partitioned,
    with_day,
    write_partitioned,
)
from graphit_spark.sources.serialized import (
    load_sg_graph,
    read_bin,
    read_sg,
    read_wsg,
    write_sg,
)

__all__ = [
    "read_edge_list",
    "read_partitioned",
    "with_day",
    "write_partitioned",
    "read_weighted_edge_list",
    "write_edge_list",
    "load_sg_graph",
    "read_bin",
    "read_sg",
    "read_wsg",
    "write_sg",
]
