"""Closure / micro-reasoner tests: synthetic DAGs (diamond, two
roots — FIXTURES.md §F4 shape) with a pure-python oracle, plus
reasoners over the graphified testdata vs DuckDB."""

import pytest
from pyspark.sql import functions as F

from pidb_rdf_spark.inference import (
    get_nodes_with_label,
    get_rels,
    has_label_inferred,
    sub_closure,
    transitive_closure,
)
from tests.test_sparql_basic import oracle


def py_closure(pairs):
    """Oracle: naive python transitive closure."""
    out = set(pairs)
    changed = True
    while changed:
        changed = False
        for a, b in list(out):
            for c, d in list(out):
                if b == c and (a, d) not in out:
                    out.add((a, d))
                    changed = True
    return out


DAG = [
    # 5-level chain + diamond (B,C -> D) + disjoint second root
    ("B", "A"), ("C", "A"), ("D", "B"), ("D", "C"), ("E", "D"),
    ("F", "E"), ("X2", "X1"), ("X3", "X2"),
]


def test_closure_matches_python_oracle(spark):
    edges = spark.createDataFrame(DAG, ["child", "parent"])
    got = {(r["child"], r["parent"]) for r in transitive_closure(edges).collect()}
    assert got == py_closure(DAG)


def test_closure_cycle_terminates(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["child", "parent"]
    )
    got = {(r["child"], r["parent"]) for r in transitive_closure(edges).collect()}
    assert got == py_closure([("a", "b"), ("b", "c"), ("c", "a")])


def test_sub_closure(spark):
    h = spark.createDataFrame(
        [(c, p, "SLO") for c, p in DAG], ["child", "parent", "kind"]
    )
    subs = {r["name"] for r in sub_closure(h, "A").collect()}
    assert subs == {"A", "B", "C", "D", "E", "F"}


@pytest.fixture(scope="module")
def label_hierarchy(spark):
    return spark.createDataFrame(
        [
            ("Customer", "Actor", "SLO"),
            ("Supplier", "Actor", "SLO"),
            ("Nation", "Place", "SLO"),
            ("Region", "Place", "SLO"),
            ("IN_NATION", "LOCATED", "SRO"),
            ("IN_REGION", "LOCATED", "SRO"),
        ],
        ["child", "parent", "kind"],
    )


def test_get_nodes_with_label(graph, label_hierarchy):
    got = sorted(
        r["uri"] for r in get_nodes_with_label(graph, label_hierarchy, "Actor").collect()
    )
    want = sorted(
        r[0]
        for r in oracle(
            """SELECT 'urn:customer:' || c_custkey FROM customer
               UNION ALL SELECT 'urn:supplier:' || s_suppkey FROM supplier"""
        )
    )
    assert got == want


def test_get_rels_inferred(graph, label_hierarchy):
    n = get_rels(graph, label_hierarchy, "LOCATED").count()
    want = oracle(
        """SELECT (SELECT COUNT(*) FROM customer)
                + (SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM nation)"""
    )[0][0]
    assert n == want


def test_has_label_inferred(graph, label_hierarchy):
    df = has_label_inferred(graph, label_hierarchy, "Place")
    rows = df.filter(F.col("has_label")).count()
    assert rows == 25 + 5  # nations + regions


def test_closure_cache_computes_once_per_frame_and_kind(spark, graph, label_hierarchy):
    """The promised CLOSURE_COMPUTES contract (r5 #6 / r6 verdict #3):
    one fixpoint per (hierarchy frame, kind) across a reasoner-family
    sequence; repeats are cache hits; a second frame recomputes."""
    import pidb_rdf_spark.inference as inf

    inf.clear_closure_cache()
    start = inf.CLOSURE_COMPUTES

    # SLO family twice -> exactly one compute
    get_nodes_with_label(graph, label_hierarchy, "Actor").count()
    get_nodes_with_label(graph, label_hierarchy, "Place").count()
    has_label_inferred(graph, label_hierarchy, "Place").count()
    assert inf.CLOSURE_COMPUTES == start + 1

    # a second kind on the SAME frame is a distinct closure -> +1
    get_rels(graph, label_hierarchy, "LOCATED").count()
    get_rels(graph, label_hierarchy, "LOCATED", direction="in").count()
    assert inf.CLOSURE_COMPUTES == start + 2

    # a kind-less hierarchy shares ONE entry across all reasoner kinds
    flat = spark.createDataFrame(
        [("Customer", "Actor"), ("IN_NATION", "LOCATED")], ["child", "parent"]
    )
    get_nodes_with_label(graph, flat, "Actor").count()   # kind=SLO
    get_rels(graph, flat, "LOCATED").count()             # kind=SRO
    assert inf.CLOSURE_COMPUTES == start + 3

    # a NEW createDataFrame over identical rows is a new LocalRelation
    # plan (Spark never marks two of those sameResult) -> recompute
    flat2 = spark.createDataFrame(
        [("Customer", "Actor"), ("IN_NATION", "LOCATED")], ["child", "parent"]
    )
    get_nodes_with_label(graph, flat2, "Actor").count()
    assert inf.CLOSURE_COMPUTES == start + 4


def test_closure_cache_plan_keying_shares_rebuilt_frames(spark, tmp_path):
    """r8 plan-keying: two independently-BUILT frames over the same
    source with the same plan (parquet-derived — the driver-entry
    shape) share ONE closure; the old id()-keying recomputed."""
    import pidb_rdf_spark.inference as inf
    from pidb_rdf_spark.inference import hierarchy_closure

    p = str(tmp_path / "hier.parquet")
    spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["child", "parent"]
    ).write.parquet(p)
    inf.clear_closure_cache()
    start = inf.CLOSURE_COMPUTES
    h1 = spark.read.parquet(p)
    h2 = spark.read.parquet(p)  # distinct Python/JVM frame, same plan
    assert hierarchy_closure(h1).count() == 3
    assert hierarchy_closure(h2).count() == 3
    assert inf.CLOSURE_COMPUTES == start + 1


def test_closure_cache_bounded_lru(spark, monkeypatch):
    """The cache evicts least-recently-used entries past
    _CLOSURE_CACHE_MAX and clear_closure_cache() empties it. The cap
    is monkeypatched small (r14): eviction semantics are identical at
    any bound, and 7 closures cost a fraction of the default 35."""
    import pidb_rdf_spark.inference as inf
    from pidb_rdf_spark.inference import hierarchy_closure

    monkeypatch.setattr(inf, "_CLOSURE_CACHE_MAX", 4)
    inf.clear_closure_cache()
    frames = [
        spark.createDataFrame([(f"c{i}", "root")], ["child", "parent"])
        for i in range(inf._CLOSURE_CACHE_MAX + 3)
    ]
    for f in frames:
        hierarchy_closure(f)
    assert len(inf._CLOSURE_CACHE) == inf._CLOSURE_CACHE_MAX

    # the OLDEST frames were evicted; re-seeking frame 0 recomputes,
    # re-seeking the newest is a hit
    before = inf.CLOSURE_COMPUTES
    hierarchy_closure(frames[-1])
    assert inf.CLOSURE_COMPUTES == before
    hierarchy_closure(frames[0])
    assert inf.CLOSURE_COMPUTES == before + 1

    inf.clear_closure_cache()
    assert len(inf._CLOSURE_CACHE) == 0


def test_driver_entries_share_one_closure(spark):
    """Bench-shaped r8 contract (verdict #5): the consolidated
    inference_suite driver entry (r13 — its three stages are the
    former nodes_with_label_inferred / nodes_linked_to_inferred /
    rels_inferred sibling entries) computes the hierarchy fixpoint
    exactly ONCE across all three stages — they share a combined
    kind-less hierarchy frame and the plan-keyed closure cache."""
    import importlib.util

    import pidb_rdf_spark.inference as inf

    spec = importlib.util.spec_from_file_location(
        "se_inference_probe", "/root/repo/__spark_entry__.py"
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    q = se.queries()
    inf.clear_closure_cache()
    start = inf.CLOSURE_COMPUTES
    sf = "/root/testdata/sf0.001"
    counts = dict(
        q["inference_suite"](spark, sf).groupBy("stage").count().collect()
    )
    assert all(counts.get(s, 0) > 0 for s in ("label", "linked", "rels"))
    assert inf.CLOSURE_COMPUTES == start + 1
