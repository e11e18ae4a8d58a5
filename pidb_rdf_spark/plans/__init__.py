from pidb_rdf_spark.plans.audit import plan_summary

__all__ = ["plan_summary"]
