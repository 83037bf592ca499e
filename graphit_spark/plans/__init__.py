from graphit_spark.plans.traversal import (
    gather_scatter,
    choose_direction,
    salted_sum,
)
from graphit_spark.plans.fusion import fused_gather

__all__ = ["gather_scatter", "choose_direction", "salted_sum", "fused_gather"]
