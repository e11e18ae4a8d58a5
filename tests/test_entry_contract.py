"""Entry-contract guards: every ``__spark_entry__.queries()`` output
must be hashable by the DRIVER's canonicalization (pandas sort +
value-hash), which is stricter than tools/check_correctness.py's
stringifying ``norm_cell`` — array/map/struct cells raise
``TypeError: unhashable type`` driver-side (r4's one red row).

These tests are schema-only (no collect), so the full 66-entry sweep
stays cheap.
"""

import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _checker():
    import check_correctness

    return check_correctness


def test_non_atomic_detector_flags_array_map_struct(spark):
    chk = _checker()
    df = spark.range(1).select(
        F.col("id"),
        F.array(F.lit(1)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit(1).alias("x")).alias("s"),
        F.lit("ok").alias("t"),
    )
    assert chk.non_atomic_columns(df.schema) == ["arr", "m", "s"]


def test_non_atomic_detector_passes_atomic(spark):
    chk = _checker()
    df = spark.range(1).select(
        F.col("id"),
        F.lit(1.5).alias("d"),
        F.lit("s").alias("t"),
        F.current_date().alias("dt"),
    )
    assert chk.non_atomic_columns(df.schema) == []


def test_every_entry_emits_atomic_columns(spark):
    """The whole queries() surface, schema-only: nothing the driver
    cannot hash ever ships again."""
    chk = _checker()
    import __spark_entry__ as E

    offenders = {}
    for name, fn in E.queries().items():
        sdf = fn(spark, SF_DIR)
        bad = chk.non_atomic_columns(sdf.schema)
        if bad:
            offenders[name] = bad
    assert offenders == {}


def test_window_sustainability_policy():
    """The arithmetic behind the staleness ceiling (window contract
    rule 3): 50-slot window x 3-round ceiling bounds the entry count
    at 150, every entry has an oracle twin, and every _DEFER_TO_TAIL
    name is a real entry (a typo'd defer silently shrinks the
    window)."""
    import __spark_entry__ as E

    names = list(E.queries())
    assert len(names) <= 150, (
        f"{len(names)} entries > 50-slot window x 3-round staleness "
        "ceiling; consolidate sibling entries before adding more"
    )
    oracles = E.oracle_sql()
    assert [k for k in names if k not in oracles] == []
    assert [k for k in E._DEFER_TO_TAIL if k not in set(names)] == []
    # the deferral never underfills the checked window
    assert len(names) - len(E._DEFER_TO_TAIL) == 50


def test_bench_full_sweep_preserves_isolated_map(tmp_path):
    """The full-sweep writer must carry BENCH_FULL.json's ``isolated``
    map forward — the r11 sweep rebuilt the record dict from scratch
    and silently deleted the fresh-JVM records BASELINE.md cites
    (VERDICT r11 #1)."""
    import json

    import bench

    path = str(tmp_path / "BENCH_FULL.json")
    with open(path, "w") as f:
        json.dump({"queries": {"old": 1.0},
                   "isolated": {"pagerank@sf0.1": {"sec": 5.9, "reps": 3}}}, f)
    bench.write_full_record({"metric": "m", "queries": {"new": 2.0}}, path)
    with open(path) as f:
        out = json.load(f)
    assert out["queries"] == {"new": 2.0}
    assert out["isolated"] == {"pagerank@sf0.1": {"sec": 5.9, "reps": 3}}
    # and the committed artifact currently carries the re-seeded map
    with open("/root/repo/BENCH_FULL.json") as f:
        committed = json.load(f)
    assert len(committed.get("isolated", {})) >= 12
