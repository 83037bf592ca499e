from graphit_spark.plans.traversal import (
    gather_scatter,
    choose_direction,
    salted_sum,
)

__all__ = ["gather_scatter", "choose_direction", "salted_sum"]
