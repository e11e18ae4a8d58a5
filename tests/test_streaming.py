"""Tests for event-stream operators and the Structured Streaming
import path. The core invariant: the SAME transformation produces
the SAME result in batch mode and under the streaming engine
(availableNow micro-batching)."""

import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from pidb_rdf_spark.sources.tables import read_events

    return read_events(spark, SF_DIR).cache()


def test_windowed_counts_batch(spark, events):
    from pidb_rdf_spark.streaming import windowed_event_counts

    out = windowed_event_counts(events, window="1 hour")
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()
    # tumbling windows: every start is on the hour
    bad = out.filter(
        (F.minute("window_start") != 0) | (F.second("window_start") != 0)
    ).count()
    assert bad == 0


def test_windowed_counts_stream_equals_batch(spark, events, tmp_path):
    """Run the identical aggregation through Structured Streaming
    (file source, availableNow trigger, watermark) and compare with
    the batch answer."""
    from pidb_rdf_spark.streaming import windowed_event_counts

    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in windowed_event_counts(events, window="1 hour").collect()
    }
    assert got == expected


def test_sessionize_gap_semantics(spark):
    from pidb_rdf_spark.streaming import sessionize

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),  # same session (10 min gap)
        (1, "2024-01-01 01:00:00"),  # new session (50 min gap)
        (2, "2024-01-01 00:00:00"),  # separate user
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = sessionize(df, gap="30 minutes")
    sess = {
        (r["user_id"], r["session_seq"]): r["n_events"] for r in out.collect()
    }
    assert sess == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_asof_join_semantics(spark):
    from pidb_rdf_spark.streaming import asof_join

    clicks = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:10:00"),
            (101, 1, "2024-01-01 00:20:00"),
            (102, 2, "2024-01-01 00:05:00"),  # no prior error
            (103, 1, "2024-01-01 00:15:00"),  # equal-ts error matches
        ],
        ["event_id", "user_id", "ts_s"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    errors = spark.createDataFrame(
        [
            (1, "2024-01-01 00:08:00", 1.5),
            (1, "2024-01-01 00:15:00", 2.5),
            (2, "2024-01-01 00:30:00", 9.9),
        ],
        ["user_id", "ts_s", "value"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    out = asof_join(clicks, errors, on="user_id", right_value_cols=["value"])
    got = {
        r["event_id"]: (
            str(r["matched_ts"]) if r["matched_ts"] else None,
            r["matched_value"],
        )
        for r in out.collect()
    }
    assert got[100] == ("2024-01-01 00:08:00", 1.5)
    assert got[101] == ("2024-01-01 00:15:00", 2.5)
    assert got[102] == (None, None)
    assert got[103] == ("2024-01-01 00:15:00", 2.5)  # >= semantics
    assert len(got) == 4  # left join keeps every click


def test_stream_import_triples(spark, tmp_path):
    """Micro-batched RDF import: triples dropped as files are merged
    into the nodes/edges tables with upsert/dedup semantics."""
    from pidb_rdf_spark.sources.rdf_reader import TRIPLES_SCHEMA
    from pidb_rdf_spark.streaming import stream_import_triples
    from pidb_rdf_spark.streaming.rdf_stream import read_triples_stream

    src = str(tmp_path / "triples_in")
    nodes_path = str(tmp_path / "nodes")
    edges_path = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    t1 = spark.createDataFrame(
        [
            ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b", False, None, None),
            ("http://ex.org/a", "http://ex.org/name", "Alice", True, None, None),
        ],
        TRIPLES_SCHEMA,
    )
    t1.write.mode("append").parquet(src)

    q = stream_import_triples(
        spark,
        read_triples_stream(spark, src),
        nodes_path,
        edges_path,
        ckpt,
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    nodes = spark.read.parquet(nodes_path)
    edges = spark.read.parquet(edges_path)
    assert nodes.count() == 2  # a and b
    assert edges.count() == 1
    a = nodes.filter(F.col("uri") == "http://ex.org/a").first()
    assert a["props"]["ns0__name"] == "Alice"


def test_dedup_stream_batch_mode(spark, events):
    from pidb_rdf_spark.streaming import dedup_stream

    doubled = events.unionAll(events)
    out = dedup_stream(doubled, ["event_id"])
    assert out.count() == events.count()


def test_dedup_stream_equals_batch(spark, events, tmp_path):
    """Doubled input through the streaming engine (watermarked
    dropDuplicatesWithinWatermark) must match batch dropDuplicates."""
    from pidb_rdf_spark.streaming import dedup_stream

    src = str(tmp_path / "dup_src")
    events.limit(500).unionAll(events.limit(500)).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        dedup_stream(stream, ["event_id"], watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_out").collect()}
    expected = {r["event_id"] for r in events.limit(500).collect()}
    assert got == expected


def test_sessionize_stream_equals_batch(spark, events, tmp_path):
    """session_window sessionization through Structured Streaming
    (append mode) matches the batch run of the same function, which in
    turn matches gap-sessionize minus the per-user ordinal.

    Append mode only emits sessions the watermark has passed, so the
    source gets one far-future sentinel row (dummy user) that pushes
    the final watermark beyond every real session."""
    from pyspark.sql import functions as F

    from pidb_rdf_spark.streaming import sessionize, sessionize_stream

    sentinel_user = -999
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinel = events.limit(1).select(
        *[
            F.lit(sentinel_user).alias(c)
            if c == "user_id"
            else (F.lit(max_ts) + F.expr("INTERVAL 10 DAYS")).alias(c)
            if c == "ts"
            else F.col(c)
            for c in events.columns
        ]
    )
    src = str(tmp_path / "events_sess_src")
    events.unionByName(sentinel).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    sess = sessionize_stream(
        stream, gap="37 minutes", watermark="1 minute"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql(
            f"SELECT * FROM sess_stream WHERE user_id != {sentinel_user}"
        ).collect()
    }
    batch_same_fn = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize_stream(events, gap="37 minutes").collect()
    }
    assert got == batch_same_fn
    # and the batch lag-based sessionize agrees (modulo session_seq)
    batch_ref = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(events, gap="37 minutes").collect()
    }
    assert got == batch_ref


def test_sliding_window_counts(spark, events):
    """slide=30m over a 1h window: every event lands in exactly 2
    windows, and each sliding bucket equals the sum of rows whose ts
    falls in [start, start+1h) — cross-checked in DuckDB."""
    import duckdb

    from pidb_rdf_spark.streaming import windowed_event_counts
    from tests.conftest import SF_DIR

    out = windowed_event_counts(
        events, window="1 hour", slide="30 minutes"
    )
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in out.collect()
    }
    # row-amplification: total window rows = 2x the tumbling case
    assert sum(n for n, _ in got.values()) == 2 * events.count()
    con = duckdb.connect()
    lo, hi = con.execute(
        f"SELECT date_trunc('hour', MIN(ts)) - INTERVAL 30 MINUTE, MAX(ts) "
        f"FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    exp = con.execute(
        f"""
        WITH halfs AS (
            SELECT generate_series AS ws
            FROM generate_series(
                TIMESTAMP '{lo}', TIMESTAMP '{hi}', INTERVAL 30 MINUTE)
        )
        SELECT CAST(h.ws AS VARCHAR), e.event_type,
               COUNT(*), CAST(SUM(round(e.value*100)) AS BIGINT)
        FROM halfs h
        JOIN '{SF_DIR}/events.parquet' e
          ON e.ts >= h.ws AND e.ts < h.ws + INTERVAL 1 HOUR
        GROUP BY 1, 2
        """
    ).fetchall()
    exp_map = {(a, b): (c, d) for a, b, c, d in exp}
    assert got == exp_map


def test_asof_join_forward_direction(spark):
    """direction='forward': smallest right_ts >= left_ts per key,
    inclusive at equality, unmatched -> NULLs."""
    from pidb_rdf_spark.streaming import asof_join

    clicks = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:10:00"),  # next error 00:15
            (101, 1, "2024-01-01 00:20:00"),  # no later error
            (102, 2, "2024-01-01 00:05:00"),  # next error 00:30
            (103, 1, "2024-01-01 00:15:00"),  # equal-ts error matches
        ],
        ["event_id", "user_id", "ts_s"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    errors = spark.createDataFrame(
        [
            (1, "2024-01-01 00:08:00", 1.5),
            (1, "2024-01-01 00:15:00", 2.5),
            (2, "2024-01-01 00:30:00", 9.9),
        ],
        ["user_id", "ts_s", "value"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    out = asof_join(
        clicks, errors, on="user_id", right_value_cols=["value"],
        direction="forward",
    )
    got = {
        r["event_id"]: (
            str(r["matched_ts"]) if r["matched_ts"] else None,
            r["matched_value"],
        )
        for r in out.collect()
    }
    assert got[100] == ("2024-01-01 00:15:00", 2.5)
    assert got[101] == (None, None)
    assert got[102] == ("2024-01-01 00:30:00", 9.9)
    assert got[103] == ("2024-01-01 00:15:00", 2.5)  # >= inclusive

    # cross-check the whole output against DuckDB's ASOF with the
    # inequality flipped
    import duckdb

    con = duckdb.connect()
    con.register("clicks", clicks.toPandas())
    con.register("errors", errors.toPandas())
    want = {
        r[0]: (str(r[1]) if r[1] else None, r[2])
        for r in con.execute(
            "SELECT l.event_id, r.ts AS matched_ts, r.value "
            "FROM clicks l ASOF LEFT JOIN errors r "
            "ON l.user_id = r.user_id AND l.ts <= r.ts"
        ).fetchall()
    }
    assert got == want


def test_user_stats_batch(spark, events):
    from pidb_rdf_spark.streaming import user_stats

    out = user_stats(events)
    assert out.count() == events.select("user_id").distinct().count()
    tot = out.agg(F.sum("n_events")).first()[0]
    assert tot == events.count()


def test_user_stats_stream_equals_batch(spark, events, tmp_path):
    """Custom stateful operator (applyInPandasWithState): final
    per-user state after the stream drains equals the batch
    aggregate. Input is split into TWO files so at least one user's
    totals must merge across micro-batches (maxFilesPerTrigger=1) —
    pinning that the state merge step is batch-boundary-invariant."""
    from pidb_rdf_spark.streaming import user_stats, user_stats_stream

    src = str(tmp_path / "events_ustats")
    half = events.filter(F.col("event_id") % 2 == 0)
    rest = events.filter(F.col("event_id") % 2 == 1)
    half.coalesce(1).write.mode("overwrite").parquet(src)
    rest.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        user_stats_stream(stream)
        .writeStream.format("memory")
        .queryName("ustats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per touching batch; the
    # memory sink appends in batch order, so the LAST emission per
    # user carries the final state
    rows = spark.sql("SELECT * FROM ustats").collect()
    got = {}
    for r in rows:
        got[r["user_id"]] = (
            r["n_events"], r["sum_cents"], r["first_ts"], r["last_ts"]
        )
    want = {
        r["user_id"]: (
            r["n_events"], r["sum_cents"], r["first_ts"], r["last_ts"]
        )
        for r in user_stats(events).collect()
    }
    assert got == want
    # at least one user actually merged across two micro-batches
    from collections import Counter

    per_user_emissions = Counter(r["user_id"] for r in rows)
    assert max(per_user_emissions.values()) >= 2


def test_user_stats_stream_on_batch_input(spark, events):
    """The streaming entry point degrades to the batch aggregate on
    non-streaming input — one call site serves both modes."""
    from pidb_rdf_spark.streaming import user_stats, user_stats_stream

    a = {tuple(r) for r in user_stats_stream(events).collect()}
    b = {tuple(r) for r in user_stats(events).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Hierarchical rollup
# ---------------------------------------------------------------------------


def test_rollup_counts_levels_consistent(spark):
    import datetime as dt

    from pidb_rdf_spark.streaming import rollup_counts

    rows = [
        (dt.datetime(2024, 1, 1, 10, 5), "a", 1.0),
        (dt.datetime(2024, 1, 1, 10, 55), "a", 2.0),
        (dt.datetime(2024, 1, 1, 23, 5), "a", 4.0),
        (dt.datetime(2024, 1, 2, 0, 5), "a", 8.0),
        (dt.datetime(2024, 1, 1, 10, 5), "b", 0.5),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    out = rollup_counts(df, units=("hour", "day"))
    by = {
        (r["level"], str(r["bucket"]), r["key"]): (r["n_events"], r["sum_cents"])
        for r in out.collect()
    }
    assert by[("hour", "2024-01-01 10:00:00", "a")] == (2, 300)
    assert by[("hour", "2024-01-01 23:00:00", "a")] == (1, 400)
    assert by[("day", "2024-01-01 00:00:00", "a")] == (3, 700)
    assert by[("day", "2024-01-02 00:00:00", "a")] == (1, 800)
    assert by[("day", "2024-01-01 00:00:00", "b")] == (1, 50)
    # day rows re-aggregate hour partials exactly: totals agree per key
    hours = sum(v[1] for k, v in by.items() if k[0] == "hour" and k[2] == "a")
    days = sum(v[1] for k, v in by.items() if k[0] == "day" and k[2] == "a")
    assert hours == days == 1500


def test_rollup_rejects_non_nesting_units(spark):
    import pytest

    from pidb_rdf_spark.streaming import rollup_counts

    df = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    with pytest.raises(ValueError):
        rollup_counts(df, units=("day", "hour"))  # coarse -> fine
    with pytest.raises(ValueError):
        rollup_counts(df, units=("week",))  # non-nesting unit
    with pytest.raises(ValueError):
        rollup_counts(df, units=())


def test_rollup_coarse_from_partials_plan(spark):
    """The day level must scan the HOUR aggregate, not the raw table:
    exactly one scan of the input in the full plan."""
    import datetime as dt

    from pidb_rdf_spark.streaming import rollup_counts

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 5), "a", 1.0)],
        ["ts", "event_type", "value"],
    )
    plan = (
        rollup_counts(df, units=("hour", "day"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LocalRelation") <= 2  # union of 2 levels, 1 scan each side max


def test_rollup_rejects_streaming_input(spark, tmp_path):
    import pytest

    from pidb_rdf_spark.streaming import rollup_counts

    spark.createDataFrame(
        [], "ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "ev"))
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(str(tmp_path / "ev"))
    with pytest.raises(ValueError, match="batch-only"):
        rollup_counts(stream, units=("hour", "day"))


def test_user_stats_stream_half_cent_rounding_matches_batch(spark, tmp_path):
    """Exact .5-cent values must round the same way (HALF_UP, away
    from zero) on both paths — pandas' default half-even rounding put
    value=0.125 one cent below the batch answer."""
    import datetime as dt

    from pidb_rdf_spark.streaming import user_stats, user_stats_stream

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 7, "view", 0.125, "{}"),   # 12.5c
        (2, dt.datetime(2024, 1, 1, 11), 7, "view", 0.135, "{}"),   # 13.5c
        (3, dt.datetime(2024, 1, 1, 12), 8, "view", 2.245, "{}"),   # 224.5c
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events = spark.createDataFrame(rows, schema)
    batch = {
        r["user_id"]: r["sum_cents"] for r in user_stats(events).collect()
    }
    assert batch == {7: 13 + 14, 8: 225}  # HALF_UP on each value

    src = str(tmp_path / "halfcent")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        user_stats_stream(stream)
        .writeStream.format("memory")
        .queryName("halfcent")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["sum_cents"]
        for r in spark.sql("SELECT * FROM halfcent").collect()
    }
    assert got == batch


def test_interval_join_batch_semantics(spark):
    from pidb_rdf_spark.streaming.events import interval_join

    rows = [
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:30:00", 7, "purchase"),   # in [0, 1h]
        (3, "2024-01-01 11:00:00", 7, "purchase"),   # boundary: included
        (4, "2024-01-01 11:00:01", 7, "purchase"),   # past upper
        (5, "2024-01-01 09:59:59", 7, "purchase"),   # before lower
        (6, "2024-01-01 10:10:00", 8, "purchase"),   # other key
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    got = sorted(
        r["event_id_r"]
        for r in interval_join(
            views, buys, on="user_id", right_cols=["event_id"]
        ).collect()
    )
    assert got == [2, 3]


def test_interval_join_stream_equals_batch(spark, events, tmp_path):
    """The same interval_join code runs as a watermarked stream-stream
    join (state evictable: the range bound caps buffering)."""
    from pidb_rdf_spark.streaming.events import interval_join

    src = str(tmp_path / "ev")
    # watermarks need TIMESTAMP (the parquet column is NTZ)
    events.withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    batch_ev = spark.read.parquet(src)

    def split(df):
        return (
            df.filter(F.col("event_type") == "view"),
            df.filter(F.col("event_type") == "purchase"),
        )

    bl, br = split(batch_ev)
    want = sorted(
        (r["event_id"], r["event_id_r"])
        for r in interval_join(
            bl, br, on="user_id", upper="30 minutes",
            right_cols=["event_id"],
        ).collect()
    )

    stream = spark.readStream.schema(batch_ev.schema).parquet(src)
    sl, sr = split(stream)
    joined = interval_join(
        sl.withWatermark("ts", "0 seconds"),
        sr.withWatermark("ts", "0 seconds"),
        on="user_id",
        upper="30 minutes",
        right_cols=["event_id"],
    )
    q = (
        joined.select("event_id", "event_id_r")
        .writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["event_id_r"])
        for r in spark.sql("SELECT * FROM ivj").collect()
    )
    assert got == want and len(want) > 0


def test_detect_sequence_contiguous_and_window(spark):
    from pidb_rdf_spark.streaming.events import detect_sequence

    rows_ = [
        # user 7: view->click->buy contiguous, inside 1h
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:10:00", 7, "click"),
        (3, "2024-01-01 10:20:00", 7, "buy"),
        # user 8: interleaved event breaks contiguity
        (4, "2024-01-01 10:00:00", 8, "view"),
        (5, "2024-01-01 10:05:00", 8, "error"),
        (6, "2024-01-01 10:10:00", 8, "click"),
        (7, "2024-01-01 10:20:00", 8, "buy"),
        # user 9: right types but outside the window
        (8, "2024-01-01 10:00:00", 9, "view"),
        (9, "2024-01-01 10:30:00", 9, "click"),
        (10, "2024-01-01 11:30:00", 9, "buy"),
    ]
    ev = spark.createDataFrame(
        rows_, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = detect_sequence(ev, ["view", "click", "buy"], within="1 hour").collect()
    assert len(got) == 1
    m = got[0]
    assert m["user_id"] == 7 and (m["id_0"], m["id_1"], m["id_2"]) == (1, 2, 3)


def test_detect_sequence_overlapping_matches_and_errors(spark):
    from pidb_rdf_spark.streaming.events import detect_sequence

    rows_ = [
        (1, "2024-01-01 10:00:00", 1, "a"),
        (2, "2024-01-01 10:01:00", 1, "a"),
        (3, "2024-01-01 10:02:00", 1, "a"),
    ]
    ev = spark.createDataFrame(
        rows_, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = detect_sequence(ev, ["a", "a"]).collect()
    # overlapping matches both count: (1,2) and (2,3)
    assert sorted((m["id_0"], m["id_1"]) for m in got) == [(1, 2), (2, 3)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least two"):
        detect_sequence(ev, ["a"])


def test_interval_join_suffix_clash_raises(spark):
    from pidb_rdf_spark.streaming.events import interval_join

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = ev.withColumn("ts_r", F.col("ts"))  # pre-existing collision
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different suffix"):
        interval_join(left, ev, on="user_id")


def test_interval_join_right_side_self_clash(spark):
    """ADVICE r8: a right frame whose columns collide with the
    suffixed key must be rejected instead of silently duplicating a
    name; non-key self-suffix pairs now rename correctly via one
    select."""
    from pidb_rdf_spark.streaming.events import interval_join

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # right has both 'event_id' and 'event_id_r': single-select rename
    # keeps them distinct (event_id_r / event_id_r_r) — no mislabel
    right = ev.withColumn("event_id_r", F.col("event_id") + 100)
    left = ev.select(
        F.col("event_id").alias("lid"), "ts", "user_id"
    )
    out = interval_join(left, right, on="user_id")
    assert sorted(out.columns) == sorted(
        ["lid", "ts", "user_id", "event_id_r", "event_id_r_r", "ts_r"]
    )
    row = out.collect()[0]
    assert row["event_id_r"] == 1 and row["event_id_r_r"] == 101
    # a suffixed name colliding with the join key itself still raises
    # (the key is always a left column, so the left-side check fires):
    # on='x_r', right column 'x' would rename to 'x_r' — duplicate
    bad_right = spark.createDataFrame(
        [(7, 1)], "x_r long, x long"
    ).withColumn("ts", F.lit("2024-01-01 10:00:00").cast("timestamp"))
    bad_left = spark.createDataFrame(
        [(7,)], "x_r long"
    ).withColumn("ts", F.lit("2024-01-01 10:00:00").cast("timestamp"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different suffix"):
        interval_join(bad_left, bad_right, on="x_r")


def test_funnel_anchored_earliest_match(spark):
    from pidb_rdf_spark.streaming.events import funnel

    rows = [
        # u1 converts fully: view 10:00 -> click 10:10 -> buy 10:20
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:10:00", "click"),
        (1, "2024-01-01 10:20:00", "buy"),
        # u2 clicks BEFORE its first view: click must not count
        (2, "2024-01-01 09:50:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        # u3 converts to click only outside the window
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 11:30:00", "click"),
        # u4 same-timestamp chain counts (>= semantics)
        (4, "2024-01-01 10:00:00", "view"),
        (4, "2024-01-01 10:00:00", "click"),
        # u5 never views
        (5, "2024-01-01 10:00:00", "buy"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["step"]: (r["step_idx"], r["n_converted"], round(r["conversion"], 4))
        for r in funnel(ev, ["view", "click", "buy"], within="1 hour").collect()
    }
    assert got["view"] == (0, 4, 1.0)     # u1-u4 have views
    assert got["click"] == (1, 2, 0.5)    # u1, u4
    assert got["buy"] == (2, 1, 0.25)     # u1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="two steps"):
        funnel(ev, ["view"])


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------


def _retention_oracle(rows, period_days):
    """Brute-force cohort matrix from (user, date) activity rows."""
    from collections import defaultdict

    first = {}
    active = defaultdict(set)
    for u, d in rows:
        bucket = d - __import__("datetime").timedelta(
            days=(d.toordinal() - 1) % period_days
        )
        first[u] = min(first.get(u, bucket), bucket)
        active[u].add(bucket)
    cells = defaultdict(int)
    for u, buckets in active.items():
        for b in buckets:
            off = (b - first[u]).days // period_days
            cells[(first[u], off)] += 1
    return {
        k: (n, round(n / cells[(k[0], 0)], 6)) for k, n in cells.items()
    }


def test_cohort_retention_crafted_weekly(spark):
    """Three cohorts with churn and a re-activation gap (offset 2
    skipped by u3): cells and fractions match the brute-force
    oracle, and empty cells are absent."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)  # a Monday: week buckets align
    ev = []
    # u1,u2 start week 0; u1 active weeks 0,1,3; u2 only week 0
    for (u, weeks) in ((1, [0, 1, 3]), (2, [0]), (3, [1, 2, 4]), (4, [1, 2])):
        for w in weeks:
            ev.append((u, base + dt.timedelta(days=7 * w, hours=u)))
            ev.append((u, base + dt.timedelta(days=7 * w + 3)))  # dup in week
    df = spark.createDataFrame(
        [(u, t) for u, t in ev], "user_id long, ts timestamp"
    )
    from pidb_rdf_spark.streaming import cohort_retention

    got = {
        (r.cohort, r.period_offset): (r.n_active, r.retention)
        for r in cohort_retention(df).collect()
    }
    want = _retention_oracle(
        [(u, t.date()) for u, t in ev], period_days=7
    )
    assert got == want
    c0 = dt.date(2024, 1, 1)
    c1 = dt.date(2024, 1, 8)
    assert got[(c0, 0)] == (2, 1.0)  # u1, u2
    assert got[(c0, 1)] == (1, 0.5)  # u1 only
    assert (c0, 2) not in got  # empty cell absent
    assert got[(c1, 0)] == (2, 1.0)  # u3, u4 cohort week 1
    assert got[(c1, 3)] == (1, 0.5)  # u3 re-activates at offset 3


def test_cohort_retention_day_and_month_grain(spark):
    import datetime as dt

    from pidb_rdf_spark.streaming import cohort_retention

    rows = [
        (1, dt.datetime(2024, 1, 5)),
        (1, dt.datetime(2024, 1, 7)),
        (1, dt.datetime(2024, 3, 2)),
        (2, dt.datetime(2024, 2, 20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort, r.period_offset): r.n_active
        for r in cohort_retention(df, period="month").collect()
    }
    assert got == {
        (dt.date(2024, 1, 1), 0): 1,
        (dt.date(2024, 1, 1), 2): 1,
        (dt.date(2024, 2, 1), 0): 1,
    }
    got_d = {
        (r.cohort, r.period_offset): r.n_active
        for r in cohort_retention(df, period="day").collect()
    }
    assert got_d[(dt.date(2024, 1, 5), 2)] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cohort_retention(df, period="hour")


def test_asof_join_null_keys_and_timestamps(spark):
    """SQL ASOF NULL semantics: right rows with NULL key/ts never
    match; left rows with NULL key or NULL ts come back unmatched —
    in BOTH directions (forward's descending sort would otherwise
    hand NULL-ts left rows the smallest-ts right row)."""
    from pidb_rdf_spark.streaming.events import asof_join

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 10.0), (3, "a", None)],
        "lid long, k string, ts double",
    )
    right = spark.createDataFrame(
        [("a", 5.0, 100), (None, 1.0, 666), ("a", None, 777)],
        "k string, ts double, v int",
    )
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.matched_v
            for r in asof_join(
                left, right, on="k", right_value_cols=["v"],
                direction=direction,
            ).collect()
        }
        assert got[2] is None and got[3] is None, (direction, got)
        if direction == "backward":
            assert got[1] == 100
        else:
            assert got[1] is None  # no right row at ts >= 10
