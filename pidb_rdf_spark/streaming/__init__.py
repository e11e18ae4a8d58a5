from pidb_rdf_spark.streaming.events import (
    asof_join,
    dedup_stream,
    detect_sequence,
    cohort_retention,
    funnel,
    interval_join,
    rollup_counts,
    sessionize,
    sessionize_stream,
    user_stats,
    user_stats_stream,
    windowed_event_counts,
)
from pidb_rdf_spark.streaming.rdf_stream import stream_import_triples

__all__ = [
    "asof_join",
    "dedup_stream",
    "detect_sequence",
    "cohort_retention",
    "funnel",
    "interval_join",
    "rollup_counts",
    "sessionize",
    "sessionize_stream",
    "user_stats",
    "user_stats_stream",
    "windowed_event_counts",
    "stream_import_triples",
]
