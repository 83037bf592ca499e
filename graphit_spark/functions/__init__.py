from graphit_spark.functions import dedup, similarity, textops

__all__ = ["textops", "dedup", "similarity"]
