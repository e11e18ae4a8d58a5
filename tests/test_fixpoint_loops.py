"""The r14 fixpoint-loop contracts: the pinned-layout state-size gate
picks a form without changing results, and `_fixpoint_conf`'s
session-global conf mutation is safe under interleaved loops
(VERDICT r13 #1 and #2)."""

import threading

import pytest
from pyspark.sql import functions as F

import pidb_rdf_spark.analytics as A

_CONF_KEYS = (
    "spark.sql.adaptive.enabled",
    "spark.sql.shuffle.partitions",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.codegen.wholeStage",
)

EDGES = [
    (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21),
    (5, 1), (12, 10),
]

WEDGES = [(a, b, (a + b) % 5 + 1) for a, b in EDGES]


def test_connected_components_gate_paths_identical(spark, monkeypatch):
    """Both sides of the state-size gate compute the same components:
    forcing the pinned path (gate=0) and the small AQE path (gate=inf)
    on one graph must agree row-for-row."""
    pairs = spark.createDataFrame(EDGES, ["src", "dst"])
    monkeypatch.setattr(A, "_FIXPOINT_MIN_STATE_ROWS", 0)
    pinned = sorted(map(tuple, A.connected_components(pairs).collect()))
    monkeypatch.setattr(A, "_FIXPOINT_MIN_STATE_ROWS", 10**9)
    small = sorted(map(tuple, A.connected_components(pairs).collect()))
    assert pinned == small


def test_sssp_gate_paths_identical(spark, monkeypatch):
    """Same contract for sssp: the full-state pinned form and the
    semi-naive small form share the i-round invariant, so bounded or
    converged they must return identical distances."""
    e = spark.createDataFrame(WEDGES, ["src", "dst", "weight"])
    s = spark.createDataFrame([(1,), (20,)], ["node"])
    for max_iter in (2, 20):  # unconverged and converged
        monkeypatch.setattr(A, "_FIXPOINT_MIN_STATE_ROWS", 0)
        pinned = sorted(
            map(tuple, A.sssp(e, s, directed=False, max_iter=max_iter).collect())
        )
        monkeypatch.setattr(A, "_FIXPOINT_MIN_STATE_ROWS", 10**9)
        small = sorted(
            map(tuple, A.sssp(e, s, directed=False, max_iter=max_iter).collect())
        )
        assert pinned == small


def test_interleaved_fixpoint_loops_restore_conf(spark, monkeypatch):
    """Two loop operators running concurrently on ONE session must not
    corrupt each other's saved conf (_FIXPOINT_LOCK serializes the
    conf-mutating loops); afterwards every touched key reads exactly
    its pre-loop value and both results are correct."""
    # force both loops through _fixpoint_conf regardless of size
    monkeypatch.setattr(A, "_FIXPOINT_MIN_STATE_ROWS", 0)
    before = {k: spark.conf.get(k) for k in _CONF_KEYS}
    pairs = spark.createDataFrame(EDGES, ["src", "dst"])
    e = spark.createDataFrame(WEDGES, ["src", "dst", "weight"])
    s = spark.createDataFrame([(1,)], ["node"])
    results: dict = {}
    errors: list = []

    def run_cc():
        try:
            results["cc"] = sorted(
                map(tuple, A.connected_components(pairs).collect())
            )
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    def run_sssp():
        try:
            results["sssp"] = sorted(
                map(tuple, A.sssp(e, s, directed=False).collect())
            )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=run_cc), threading.Thread(target=run_sssp)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    after = {k: spark.conf.get(k) for k in _CONF_KEYS}
    assert after == before
    # results stay correct under interleaving
    assert results["cc"] == sorted(
        map(tuple, A.connected_components(pairs).collect())
    )
    assert results["sssp"] == sorted(
        map(tuple, A.sssp(e, s, directed=False).collect())
    )
