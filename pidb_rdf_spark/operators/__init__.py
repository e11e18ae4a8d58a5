from pidb_rdf_spark.operators.window import topk_per_group

__all__ = ["topk_per_group"]
