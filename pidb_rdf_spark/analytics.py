"""Iterative graph analytics: connected components, BFS hop counts,
PageRank, and near-dup clustering built on them.

The reference's only iterative compute is its ontology closure
(``semantics/inference/MicroReasoners.java:20-22``, mirrored here by
``inference.transitive_closure``); these operators extend the same
driver-side semi-naive loop — the one computation Catalyst cannot
express in a single plan (SURVEY.md §4) — to the whole-graph
analytics a 100 TB pipeline needs (duplicate clustering, reachability
tiers, link-based quality scores).

Scale shape shared by every loop below:
- each iteration is one equi-join + one aggregation (both shuffle on
  the node id — a cluster co-partitions them after the first stage);
- ``localCheckpoint(eager=True)`` per round truncates lineage so the
  plan does not grow with iteration count;
- convergence tests run on the frontier / delta only, never the full
  state;
- min-label propagation converges in O(diameter) rounds; for
  pathological diameters ``connected_components_star`` provides the
  pointer-doubling alternative (O(log n) rounds).
"""

from __future__ import annotations

import itertools
import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Below this state size, whole-stage codegen is disabled inside
# fixpoint loops: Janino compilation of each round's stages costs more
# than interpreting a few-MB state ever could (measured ~1.3 s of the
# 4.7 s pagerank wall at sf0.1). Above it, codegen pays for itself and
# stays on. Env-overridable for cluster tuning.
_LOOP_CODEGEN_OFF_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_LOOP_CODEGEN_OFF_MAX_ROWS", "5000000")
)

# Target rows per partition for the pinned loop layout; N =
# clamp(state_rows // this + 1, 1, session shuffle partitions), so the
# local bench gets 1 partition (no scheduling waste on KB-sized state)
# and a cluster session (whose shuffle.partitions is sized for the
# cluster) keeps its full configured parallelism once the state is
# big enough to use it.
_LOOP_ROWS_PER_PARTITION = int(
    os.environ.get("SPARK_GRAFT_LOOP_ROWS_PER_PARTITION", "100000")
)

# State-size gate for the pinned-layout conversion (r14, VERDICT r13
# #1). Below this many state rows the `_fixpoint_conf` form runs the
# whole loop on ONE partition with AQE and broadcasts off, plus fixed
# setup jobs (node count + two repartition+checkpoints) that never
# amortize — the driver measured sssp 4.13→7.72 s and
# connected_components_regions 1.55→2.11 s at sf0.1 from exactly this.
# Loops with a semi-naive (shrinking-frontier) small-state form keep
# their r12 AQE shape below the gate: the planner's broadcast-friendly
# default wins at small state (the r13 transitive_closure rejection
# proved the same point). Defaults to _LOOP_ROWS_PER_PARTITION — the
# first state size at which the sizer allocates a second partition,
# i.e. the point where the pinned layout starts to mean something.
_FIXPOINT_MIN_STATE_ROWS = int(
    os.environ.get(
        "SPARK_GRAFT_FIXPOINT_MIN_STATE_ROWS", str(_LOOP_ROWS_PER_PARTITION)
    )
)

# _fixpoint_conf mutates SESSION-GLOBAL SQL conf for the duration of a
# loop. Concurrent loops on one session (threads submitting queries in
# parallel, guide §2.6) would otherwise clobber each other's settings
# and restore the wrong saved values; this lock serializes the loops
# themselves (reentrant, so a loop that calls another loop nests
# correctly: the inner restores the outer's values, the outer restores
# the originals). Non-loop queries submitted concurrently from other
# threads still observe the loop's conf while it runs — inherent to
# session-global conf; isolate with a separate SparkSession
# (`spark.newSession()`) when that matters.
_FIXPOINT_LOCK = threading.RLock()

# negative_samples broadcasts its ranked-vocabulary draw join only
# when the exact vocab count (from ranked_vocabulary's bounded count
# pass) provably fits: ~40 B/row keeps this cap well under the
# default 10 MB autoBroadcast threshold. A corpus-scale vocabulary
# falls back to the sort-merge plan unchanged. Module-level so tests
# can pin both sides of the boundary (VERDICT r13 #7).
_NEG_BROADCAST_MAX_VOCAB = int(
    os.environ.get("SPARK_GRAFT_NEG_BROADCAST_MAX_VOCAB", "250000")
)

_VIEW_SEQ = itertools.count()


@contextmanager
def _fixpoint_conf(spark, n_state_rows: int):
    """Pin a STATIC layout for a fixpoint loop and yield the partition
    count N to lay the loop frames out with (guide §2.4: remove
    shuffles outright; §1.2: fix the distributed algorithm first).

    Inside the block:

    - ``spark.sql.adaptive.enabled=false``: two reasons. (a) AQE
      materializes every Exchange as its OWN job — a 10-round loop
      with ~5 exchanges/round schedules ~50+ jobs whose fixed overhead
      dominates at small state (measured 123 jobs / 10 rounds for
      pagerank at sf0.1; 28 after this change). (b) PySpark's
      ``localCheckpoint`` under AQE erases the output partitioning
      (``UnknownPartitioning``), so round r+1 cannot reuse round r's
      layout and every round re-shuffles BOTH join sides. With AQE
      off, checkpoints preserve ``HashPartitioning`` and the loop
      below runs each round with exactly ONE data shuffle (the
      aggregation) — which is also the right plan at 100 TB: the edge
      frame is shuffled once before the loop, never per round. The
      loop body's shapes are fully known after round one; there is
      nothing left for AQE to adapt.
    - ``spark.sql.shuffle.partitions=N``: aggregations inside the loop
      land on the same N the loop frames were repartitioned to, so
      state⋈contrib joins need no exchange. N is size-derived (never a
      constant): small state → 1 partition locally, large state → the
      session's configured parallelism.
    - ``spark.sql.autoBroadcastJoinThreshold=-1``: keeps the planner
      from broadcasting the state side each round (a per-round
      broadcast-build job); the co-partitioned sort-merge join is
      exchange-free and cheaper every round after the first.
    - whole-stage codegen off for small states only (see
      ``_LOOP_CODEGEN_OFF_MAX_ROWS``).

    Everything is restored on exit, including on error. The whole
    block runs under ``_FIXPOINT_LOCK`` (see its comment): interleaved
    loops on one session serialize instead of corrupting each other's
    saved conf."""
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.codegen.wholeStage",
    )
    with _FIXPOINT_LOCK:
        saved = {k: spark.conf.get(k) for k in keys}
        n_parts = max(
            1,
            min(
                int(saved["spark.sql.shuffle.partitions"]),
                int(n_state_rows) // _LOOP_ROWS_PER_PARTITION + 1,
            ),
        )
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        if n_state_rows <= _LOOP_CODEGEN_OFF_MAX_ROWS:
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try:
            yield n_parts
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)


def _loop_view(df: DataFrame, prefix: str) -> str:
    """Register ``df`` under a fresh unique temp-view name and return
    it. Fixpoint loops re-register the per-round state under the SAME
    name (``createOrReplaceTempView``), so the round's SQL text is
    built once and re-parsed per round — ~3 py4j calls per round
    instead of ~25 DataFrame-API calls (measured 180-240 ms/round of
    pure Python driver time at sf0.1, the largest single line item)."""
    name = f"__{prefix}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    return name


def _components_driver_side(spark, edge_rows, id_dtype) -> DataFrame:
    """Union-find over a driver-resident (bounded) edge list; output
    matches the distributed fixpoint exactly: (node, component) with
    component = min reachable node id."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    members: dict = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    out = []
    for nodes in members.values():
        comp = min(nodes)
        out.extend((n, comp) for n in nodes)
    out.sort()
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", id_dtype, False),
            T.StructField("component", id_dtype, False),
        ]
    )
    return spark.createDataFrame(out, schema=schema)


def _sym(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge view: both directions, self-loops dropped."""
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return (
        fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    small_cap: int | None = None,
) -> DataFrame:
    """(node, component) over the undirected graph of ``pairs``;
    component = the minimum node id reachable from the node (a
    canonical, deterministic representative). Min-label propagation
    to fixpoint.

    ``small_cap``: if set and the symmetrized edge set has at most
    that many rows, components are computed driver-side with
    union-find in one collect — ~2 Spark jobs per propagation round
    otherwise dominate wall-clock on small pair sets (near-dup pair
    graphs are usually tiny relative to the corpus). Above the cap
    the distributed fixpoint runs unchanged."""
    edges = _sym(pairs, src, dst)
    if small_cap is not None:
        probe = edges.limit(small_cap + 1).collect()
        if len(probe) <= small_cap:
            return _components_driver_side(
                pairs.sparkSession, probe, edges.schema["src"].dataType
            )
    edges = edges.localCheckpoint(eager=True)
    spark = pairs.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # State-size gate (r14, VERDICT r13 #1): below
    # _FIXPOINT_MIN_STATE_ROWS the pinned-layout conversion runs its
    # AQE-off rounds on ONE partition with fixed setup jobs (two
    # repartition+checkpoints) that never amortize — the driver
    # measured connected_components_regions 1.55→2.11 s at sf0.1 from
    # the ungated form. Small graphs keep the r12 AQE loop — same
    # min-label math, identical output. The nodes frame is shared:
    # the small path seeds its labels from the same checkpoint.
    if n < _FIXPOINT_MIN_STATE_ROWS:
        return _connected_components_small(edges, nodes, max_iter)
    # Pinned-layout loop (_fixpoint_conf): edges laid out by dst (the
    # per-round join key) once, labels by node. Per round: the
    # neighbor-min aggregate is the ONE exchange (GROUP BY src over
    # the co-partitioned join ∪ own label), and the convergence test
    # rides the same statement as a layout-preserving self-join flag
    # (__chg) instead of a separate join job. min() over ids is
    # order-independent, so values are identical to the
    # union+groupBy-min form this replaces.
    with _fixpoint_conf(spark, n) as n_parts:
        ew = edges.repartition(n_parts, "dst").localCheckpoint(eager=True)
        labels = (
            nodes.select("node", F.col("node").alias("component"))
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
        vl = _loop_view(labels, "cc_labels")
        ve = _loop_view(ew, "cc_edges")
        round_sql = f"""
            SELECT m.node, m.component,
                   (m.component != l.component) AS __chg
            FROM (
              SELECT node, min(component) AS component
              FROM (
                SELECT e.src AS node, nl.component
                FROM {ve} e JOIN {vl} nl ON e.dst = nl.node
                UNION ALL
                SELECT node, component FROM {vl}
              )
              GROUP BY node
            ) m JOIN {vl} l ON m.node = l.node
        """
        try:
            for _ in range(max_iter):
                labels.createOrReplaceTempView(vl)
                labels = spark.sql(round_sql).localCheckpoint(eager=True)
                if labels.filter("__chg").isEmpty():
                    break
        finally:
            spark.catalog.dropTempView(vl)
            spark.catalog.dropTempView(ve)
    return labels.select("node", "component")


def _connected_components_small(
    edges: DataFrame, nodes: DataFrame, max_iter: int
) -> DataFrame:
    """Min-label propagation below the pinned-layout gate: the r12
    AQE form — per round one union+groupBy-min plus a convergence
    join, planner defaults (broadcast, AQE) left on. ``edges`` is the
    symmetrized, checkpointed edge set; ``nodes`` its checkpointed
    distinct endpoints (shared with the caller's gate probe). Output
    contract identical to the pinned path: (node, component),
    component = min reachable id."""
    labels = nodes.select(F.col("node"), F.col("node").alias("component"))
    for _ in range(max_iter):
        # each node's new label: min(own, min over neighbors' labels)
        nbr = edges.join(
            labels.withColumnRenamed("node", "dst"), on="dst", how="inner"
        ).select(F.col("src").alias("node"), F.col("component"))
        new = (
            labels.unionAll(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        converged = (
            new.join(labels.withColumnRenamed("component", "old"), on="node")
            .filter(F.col("component") != F.col("old"))
            .isEmpty()
        )
        labels = new
        if converged:
            break
    return labels


def connected_components_star(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log n) rounds instead of min-label propagation's
    O(diameter), the documented upgrade path for long-path graphs at
    scale (SCALE.md). Output contract identical to
    ``connected_components``: component = min reachable node id.

    Each round is two joins + two min-aggregates over the current
    edge set (no per-node neighbor collects — hub skew stays in hash
    aggregates, which partial-aggregate map-side). Convergence = the
    canonical edge set stops changing."""
    edges = _sym(pairs, src, dst).localCheckpoint(eager=True)
    all_nodes = (
        edges.select(F.col("src").alias("node")).dropDuplicates()
        .localCheckpoint(eager=True)
    )

    def min_nbr(e):
        # m(u) = min(Γ(u) ∪ {u})
        return (
            e.groupBy("src")
            .agg(F.min("dst").alias("_mn"))
            .select("src", F.least(F.col("src"), F.col("_mn")).alias("m"))
        )

    cur = edges
    n_cur = cur.count()
    # r13: the alternating rounds run under the pinned static layout
    # (AQE off — measured 5.0→3.9 s warm at sf0.1 on top of the probe
    # fix below; size-derived partitions). The edge set is the loop
    # state, so it is the sizer.
    with _fixpoint_conf(edges.sparkSession, n_cur):
        cur, n_cur = _components_star_rounds(cur, n_cur, max_iter, min_nbr)
    # at the fixpoint every non-root neighbors its component min
    labels = min_nbr(cur).select(
        F.col("src").alias("node"), F.col("m").alias("component")
    )
    # isolated-after-contraction roots keep themselves
    roots = all_nodes.join(labels.select("node"), on="node", how="leftanti")
    return labels.unionAll(
        roots.select("node", F.col("node").alias("component"))
    )


def _components_star_rounds(cur, n_cur, max_iter, min_nbr):
    """The large-star/small-star rounds of
    :func:`connected_components_star`, run under the caller's pinned
    layout; returns the fixpoint edge set and its size."""
    for _ in range(max_iter):
        # large-star: (v, m(u)) for v ∈ Γ(u), v > u
        m = min_nbr(cur)
        large = (
            cur.join(m, on="src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        ls = (
            large.unionAll(m.select(F.col("src"), F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates()
        )
        # lazy (r13): two consumers (m2, small) share the one
        # materialization that rides nxt's count below
        ls = ls.unionAll(
            ls.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates().localCheckpoint(eager=False)
        # small-star: (v, m(u)) for v ∈ Γ(u), v < u — plus (u, m(u))
        m2 = min_nbr(ls)
        small = (
            ls.join(m2, on="src")
            .filter(F.col("dst") < F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        nxt = (
            small.unionAll(m2.select(F.col("src"), F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates()
        )
        nxt = nxt.unionAll(
            nxt.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates().localCheckpoint(eager=False)
        # convergence (r13): both frames are deduplicated SETS, so
        # equality ⟺ equal size AND nxt \ cur = ∅. One count (which
        # also materializes the lazy round checkpoint) replaces the
        # two per-round exceptAll probes; the anti-join only runs on
        # the rare round where the sizes actually match.
        n_nxt = nxt.count()
        changed = n_nxt != n_cur or not nxt.join(
            cur, on=["src", "dst"], how="leftanti"
        ).isEmpty()
        cur = nxt
        n_cur = n_nxt
        if not changed:
            break
    return cur, n_cur


def shortest_hops(
    pairs: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
    max_iter: int = 50,
) -> DataFrame:
    """(node, hops) = unweighted BFS distance from the nearest source
    node. ``sources`` is a one-column DataFrame of node ids. Frontier
    expansion: each round joins ONLY the newly-settled frontier
    against the edges (semi-naive), so total work is O(edges reached),
    not O(edges × diameter).

    The settled set is kept as a UNION of the per-hop frontier
    checkpoints rather than re-materialized each round: hops never
    change once assigned (unlike :func:`sssp`, whose distances relax),
    so re-checkpointing the whole accumulated frame every round —
    O(V·diameter) total writes on a big graph — buys nothing. The
    union plan grows one cached-scan branch per hop, bounded by
    ``max_iter``; every branch is already pinned, so no lineage
    blow-up."""
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        if directed
        else _sym(pairs, src, dst)
    ).localCheckpoint(eager=True)
    dist = sources.select(
        F.col(sources.columns[0]).alias("node"), F.lit(0).cast("long").alias("hops")
    ).dropDuplicates(["node"]).localCheckpoint(eager=True)
    frontier = dist
    for hop in range(1, max_iter + 1):
        reached = (
            edges.join(
                frontier.withColumnRenamed("node", "src").select("src"),
                on="src",
                how="leftsemi",
            )
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(dist.select("node"), on="node", how="leftanti")
            .select("node", F.lit(hop).cast("long").alias("hops"))
            # lazy + count (r13): ONE count() both fully materializes
            # the round checkpoint and decides termination. (An
            # isEmpty probe here measured SLOWER than the eager form:
            # it limit-probes, then doCheckpoint materializes the rest
            # as a second implicit job — see OPTIMIZATION_r13.md.)
            .localCheckpoint(eager=False)
        )
        if reached.count() == 0:
            break
        dist = dist.unionAll(reached)
        frontier = reached
    return dist


def sssp(
    pairs: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    directed: bool = True,
    max_iter: int = 20,
) -> DataFrame:
    """(node, dist) = minimum-cost distance from the nearest source
    node — bounded Bellman-Ford with semi-naive frontiers.

    Each round relaxes ONLY edges out of nodes whose distance improved
    last round, so total work is O(edges touched by improvements), not
    O(edges x rounds); the loop exits early at the fixpoint. After i
    rounds ``dist`` equals the minimum cost over paths of <= i edges
    (the same invariant whether relaxation is naive or semi-naive),
    which is what makes the operator replayable: an oracle that
    unrolls i naive rounds matches this exactly, converged or not.

    Weights must be non-negative (Bellman-Ford relaxation converges
    to shortest costs only without negative cycles; with bounded
    rounds, negative edges would make the i-round invariant the only
    guarantee). INTEGER weights recommended: min() over exact longs
    is partition-order-independent, where float path sums can tie
    apart by rounding. One shuffle per round (join on src + min-combine
    on dst); ``localCheckpoint`` truncates lineage like the other
    fixpoint loops here.
    """
    from pyspark.sql import types as T

    wtype = pairs.schema[weight].dataType
    if not isinstance(
        wtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # a silent cast('long') would TRUNCATE fractional weights and
        # return wrong shortest paths; pre-scale to integers (e.g.
        # cents) instead
        raise ValueError(
            f"sssp requires integral weights, got {wtype.simpleString()}; "
            "scale fractional weights to integers first"
        )
    e = pairs.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
        # NULL weight = no usable edge: dropped here, because NULL
        # would win min(struct(dist, ...)) (NULLs sort first) and
        # poison every downstream distance
    ).filter(F.col("w").isNotNull())
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    edges = e.localCheckpoint(eager=True)
    # Pinned-layout loop (_fixpoint_conf): state = EVERY node (edge
    # endpoints ∪ sources), dist NULL = unreached, laid out by node
    # once; edges laid out by src once. The semi-naive frontier is a
    # FILTER of the state (is_new carries "reached or strictly
    # improved last round"), so the frontier⋈edges join is
    # co-partitioned with no exchange, and the per-round plan is: one
    # contribution shuffle (GROUP BY dst) + a layout-preserving merge
    # left-join back onto the state. Long-integer min/+ semantics are
    # exactly those of the union+min(struct) form this replaces: a
    # candidate wins only when strictly smaller (ties keep old =
    # is_new false), so the i-round invariant the oracle replays is
    # unchanged.
    spark = pairs.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .unionAll(sources.select(F.col(sources.columns[0]).alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # State-size gate (r14, VERDICT r13 #1): the pinned form carries
    # the FULL node set as loop state — per round it rewrites O(V)
    # rows even when the frontier is nearly empty, which only pays
    # once the state is big enough to occupy a real layout (the
    # driver measured 4.13→7.72 s at sf0.1 from the ungated
    # conversion: 34k nodes → a SinglePartition AQE-off loop). Below
    # the gate the r12 semi-naive form (frontier-sized rounds,
    # planner defaults) wins; n — the true state size, the same number
    # _fixpoint_conf sizes by — is the gate probe.
    if n < _FIXPOINT_MIN_STATE_ROWS:
        return _sssp_small(edges, sources, max_iter)
    with _fixpoint_conf(spark, n) as n_parts:
        ew = edges.repartition(n_parts, "src").localCheckpoint(eager=True)
        state = (
            nodes.join(
                sources.select(
                    F.col(sources.columns[0]).alias("node"),
                    F.lit(0).cast("long").alias("dist"),
                ).dropDuplicates(["node"]),
                on="node",
                how="left",
            )
            .select("node", "dist", F.col("dist").isNotNull().alias("is_new"))
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
        vs = _loop_view(state, "sssp_state")
        ve = _loop_view(ew, "sssp_edges")
        improved = "c.nd IS NOT NULL AND (s.dist IS NULL OR c.nd < s.dist)"
        round_sql = f"""
            SELECT s.node,
                   CASE WHEN {improved} THEN c.nd ELSE s.dist END AS dist,
                   ({improved}) AS is_new
            FROM {vs} s
            LEFT JOIN (
              SELECT e.dst AS node, min(f.dist + e.w) AS nd
              FROM {ve} e JOIN {vs} f ON e.src = f.node AND f.is_new
              GROUP BY e.dst
            ) c ON s.node = c.node
        """
        try:
            for _ in range(max_iter):
                state.createOrReplaceTempView(vs)
                state = spark.sql(round_sql).localCheckpoint(eager=True)
                if state.filter("is_new").isEmpty():
                    break
        finally:
            spark.catalog.dropTempView(vs)
            spark.catalog.dropTempView(ve)
    return state.filter(F.col("dist").isNotNull()).select("node", "dist")


def _sssp_small(
    edges: DataFrame, sources: DataFrame, max_iter: int
) -> DataFrame:
    """Bellman-Ford below the pinned-layout gate: the r12 semi-naive
    form whose per-round state is the reached set only, planner
    defaults left on. ``edges`` is the direction-expanded (src, dst,
    w) frame, already checkpointed. Long-integer min/+ semantics and
    the i-round invariant match the pinned path exactly."""
    dist = (
        sources.select(
            F.col(sources.columns[0]).alias("node"),
            F.lit(0).cast("long").alias("dist"),
        )
        .dropDuplicates(["node"])
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(max_iter):
        # ONE shuffle per round: merge the old distances with the
        # relaxed candidates and take min(struct(dist, is_new)) per
        # node — struct ordering breaks dist ties toward is_new=False
        # (false < true), so is_new survives in the winner exactly
        # when the node is newly reached or strictly improved. That
        # folds candidate reduction, improvement detection, and the
        # distance merge into a single aggregation.
        cand = edges.join(
            frontier.withColumnRenamed("node", "src"), on="src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
            F.lit(True).alias("is_new"),
        )
        merged = (
            dist.withColumn("is_new", F.lit(False))
            .unionByName(cand)
            .groupBy("node")
            .agg(F.min(F.struct("dist", "is_new")).alias("s"))
            .select(
                "node",
                F.col("s.dist").alias("dist"),
                F.col("s.is_new").alias("is_new"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter("is_new").select("node", "dist")
        if frontier.isEmpty():
            return merged.select("node", "dist")
        dist = merged.select("node", "dist")
    return dist


def pagerank(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    personalize: DataFrame | None = None,
    weight: str | None = None,
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous power iterations with
    uniform teleport and dangling-mass redistribution; Σrank = 1 every
    round. Fixed iteration count (not an epsilon test) keeps the
    result deterministic and the loop bounded.

    ``weight`` names an edge-weight column for WEIGHTED PageRank:
    a node's rank splits over its out-edges proportionally to weight
    (w/Σw_out instead of 1/out-degree). Zero/negative-weight edges
    are dropped up front (they carry no mass; a node whose every
    out-edge is dropped becomes dangling). The unweighted path is
    bit-for-bit untouched — its oracle entries replay the exact
    float op order.

    ``personalize``: a one-column frame of seed nodes switches to
    PERSONALIZED PageRank — teleport and dangling mass return to the
    seed set (uniformly over it) instead of all nodes, so rank
    measures proximity to the seeds (the recommender / graph-feature
    workhorse). Seeds absent from the graph are ignored; an empty
    effective seed set raises. The uniform path is bit-for-bit
    unchanged (its oracle entry replays the exact float op order)."""
    spark = pairs.sparkSession
    if weight is None:
        edges = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    else:
        edges = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        ).filter(F.col("w") > 0)
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    m = None
    if personalize is not None:
        seeds = (
            personalize.select(
                F.col(personalize.columns[0]).alias("node")
            )
            .dropDuplicates()
            .join(nodes, on="node")
            .localCheckpoint(eager=True)
        )
        m = seeds.count()
        if m == 0:
            raise ValueError("no personalization seed exists in the graph")
    # Pinned-layout loop (see _fixpoint_conf): the per-round join key
    # is src on the edge side and node on the state side, so both loop
    # invariants are hash-laid-out ONCE before the loop — per round,
    # the only data shuffle left is the contribution aggregation
    # (map-side partial, ≤|V| rows after it), and the dangling mass
    # rides along as a 1-row scalar subquery, never a driver
    # round-trip. The per-node out-degree is FOLDED INTO the edge
    # frame (one setup join) instead of being re-joined every round,
    # and the dangling test is a static per-node flag (sdeg NULL =
    # no out-edges) carried in the state frame instead of a per-round
    # LEFT ANTI join. Float semantics are expression-for-expression
    # those of the r12 implementation (the oracle replays them); only
    # partition layout and plan shape changed.
    with _fixpoint_conf(spark, n) as n_parts:
        if weight is None:
            out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        else:
            out_deg = edges.groupBy("src").agg(F.sum("w").alias("deg"))
        ew_cols = ["src", "dst", "deg"] + (["w"] if weight is not None else [])
        ew = (
            edges.join(out_deg, on="src")
            .select(*ew_cols)
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        state = nodes.join(
            out_deg.withColumnRenamed("src", "node"), on="node", how="left"
        ).withColumnRenamed("deg", "sdeg")
        if personalize is None:
            state = state.select(
                "node", (F.lit(1.0) / n).alias("rank"), "sdeg"
            )
        else:
            state = (
                state.join(
                    seeds.select("node", F.lit(1).alias("__s")),
                    on="node",
                    how="left",
                )
                .withColumn(
                    "pref",
                    F.when(F.col("__s").isNotNull(), F.lit(1.0 / m))
                    .otherwise(F.lit(0.0)),
                )
                .select(
                    "node", F.col("pref").alias("rank"), "sdeg", "pref"
                )
            )
        state = state.repartition(n_parts, "node").localCheckpoint(eager=True)
        vs = _loop_view(state, "pr_state")
        ve = _loop_view(ew, "pr_ew")
        share = "st.rank / e.deg" if weight is None else "st.rank * e.w / e.deg"
        dang = f"(SELECT coalesce(sum(rank), 0.0d) FROM {vs} WHERE sdeg IS NULL)"
        if personalize is None:
            rank_expr = (
                f"{(1.0 - damping) / n!r}d + {damping!r}d * {dang} / {float(n)!r}d"
                f" + {damping!r}d * coalesce(c.in_rank, 0.0d)"
            )
            keep = "s.sdeg"
        else:
            rank_expr = (
                f"{1.0 - damping!r}d * s.pref + {damping!r}d * {dang} * s.pref"
                f" + {damping!r}d * coalesce(c.in_rank, 0.0d)"
            )
            keep = "s.sdeg, s.pref"
        round_sql = f"""
            SELECT s.node, {rank_expr} AS rank, {keep}
            FROM {vs} s
            LEFT JOIN (
              SELECT e.dst AS node, sum({share}) AS in_rank
              FROM {ve} e JOIN {vs} st ON e.src = st.node
              GROUP BY e.dst
            ) c ON s.node = c.node
        """
        try:
            for _ in range(n_iter):
                state.createOrReplaceTempView(vs)
                state = spark.sql(round_sql).localCheckpoint(eager=True)
        finally:
            spark.catalog.dropTempView(vs)
            spark.catalog.dropTempView(ve)
    return state.select("node", "rank")


def near_dup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    a: str = "a",
    b: str = "b",
    small_cap: int | None = 100_000,
) -> DataFrame:
    """(id, cluster) from near-duplicate pairs: connected components
    over the pair graph, so transitively-linked duplicates land in one
    cluster with the minimum member id as its deterministic canonical.
    With ``all_ids`` (one id column), unpaired ids come back as
    singleton clusters — the standard keep-one-per-cluster dedup
    output is then ``filter(id == cluster)``.

    Near-dup pair graphs are sparse relative to the corpus (LSH
    candidate pairs that survived exact verification), so by default
    components run driver-side (union-find) when the pair set fits
    under ``small_cap`` rows — the distributed min-label loop costs
    ~2 jobs × O(diameter) rounds, which dominates on small inputs.
    Past the cap the distributed fixpoint runs; singleton handling is
    a single leftanti join either way."""
    comp = connected_components(
        pairs, src=a, dst=b, small_cap=small_cap
    ).withColumnRenamed(
        "node", "id"
    ).withColumnRenamed("component", "cluster")
    if all_ids is None:
        return comp
    ids = all_ids.select(F.col(all_ids.columns[0]).alias("id")).dropDuplicates()
    singles = ids.join(comp.select("id"), on="id", how="leftanti").select(
        "id", F.col("id").alias("cluster")
    )
    return comp.unionAll(singles)


def triangle_count(
    pairs: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, triangles): how many triangles each node participates in,
    over the undirected simple graph of ``pairs``. The standard
    cohesion signal — on a near-dup pair graph, high counts flag
    template/boilerplate families whose members all match each other.

    Plan: canonical orientation (u < v) makes each triangle countable
    exactly once as u < v < w; two equi-joins build and close wedges
    (no driver loop — this one IS a single Catalyst plan). Skew note:
    wedge counts are Σdeg², so at scale the hot keys are high-degree
    nodes — AQE skew-split handles moderate skew; beyond that the known
    fix is degree-ordered orientation (each edge charged to its
    lower-degree endpoint), not needed at current sizes."""
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
        )
    )
    tri = wedge.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("z")), on=["x", "z"], how="leftsemi"
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )


def local_clustering(
    pairs: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, triangles, degree, lcc): each node's local clustering
    coefficient over the undirected simple graph — lcc = 2·t /
    (d·(d−1)), the fraction of its neighbor pairs that are themselves
    connected (how clique-like the node's neighborhood is; the
    Watts-Strogatz per-node statistic). Degree < 2 ⇒ 0.0 (the
    NetworkX convention — no neighbor pairs to close).

    Plan: :func:`triangle_count`'s wedge-close joins + one degree
    aggregate + a left join (zero-triangle nodes keep their row).
    The lcc float is ONE division of two small exact integers —
    IEEE-deterministic, so cross-engine oracles compare it directly,
    no bucketing needed. Same Σdeg² wedge-skew note as
    triangle_count."""
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    tri = triangle_count(e, src="u", dst="v")
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return (
        deg.join(tri, on="node", how="left")
        .select(
            "node",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            "degree",
            F.when(
                F.col("degree") >= 2,
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def kcore(
    pairs: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """(node) rows of the k-core: the maximal subgraph of the
    undirected simple graph of ``pairs`` in which every node has
    degree >= k. The standard noise filter before community/cohesion
    analysis — at pipeline scale it strips the long tail of weakly
    connected documents from a near-dup or citation graph before the
    expensive stages.

    Plan: iterative peel — each round computes current degrees (one
    aggregation) and drops nodes below k (one semi-join on each
    endpoint); converges when a round removes nothing. Rounds equal
    the peeling depth: small on real (power-law) graphs, but O(n) in
    the adversarial chain case (k=2 peels two chain ends per round) —
    the same long-path caveat as min-label components; raise
    ``max_rounds`` for such graphs (the result after an exhausted
    budget is a SUPERSET of the k-core: peeling stopped early).
    Lineage truncated per round, convergence tested on a one-row
    probe only."""
    if k < 1:
        raise ValueError("k must be >= 1")
    edges = _sym(pairs, src, dst).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("src")
        # symmetric view: a node's degree is its out-degree here
        dropped = deg.filter(F.col("__deg") < k).limit(1).isEmpty()
        if dropped:
            break
        keep = keep.localCheckpoint(eager=True)
        edges = (
            edges.join(keep, on="src", how="leftsemi")
            .join(keep.withColumnRenamed("src", "dst"), on="dst", how="leftsemi")
            .localCheckpoint(eager=True)
        )
    return edges.select(F.col("src").alias("node")).dropDuplicates()


def core_numbers(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 200,
) -> DataFrame:
    """(node, coreness) for every node of the undirected simple graph
    of ``pairs``: coreness = the largest k such that the node belongs
    to the k-core — the per-node refinement of :func:`kcore` (one
    call yields every core membership at once: ``coreness >= k`` IS
    the k-core). The standard graph-degeneracy profile used to rank
    how deeply embedded a document/account sits in a near-dup or
    interaction graph.

    Algorithm: ascending-threshold peel. At stage k, nodes with
    degree < k peel (to a per-stage fixpoint); EVERY node that
    vanishes during stage k — peeled directly or isolated because
    its last neighbors peeled — has coreness k-1, captured as a set
    difference of the surviving node sets, so no node can fall
    through unassigned. Nodes never appearing in ``pairs`` are not in
    the edge-induced node set and get no row (coreness 0 by
    convention — prepend them with a left join if needed).

    Plan shape per round: one degree aggregation + two semi-joins,
    id-keyed, lineage truncated — identical to :func:`kcore`; total
    rounds = Σ per-stage peel depth, bounded by ``max_rounds`` and
    RAISING on exhaustion (a truncated peel would mislabel every
    remaining node, so silent truncation is not an option). Rounds
    are only charged when something actually peels: once a stage
    reaches its fixpoint, the threshold JUMPS to the surviving
    minimum degree + 1 (every threshold in between peels nothing, so
    a dense region — e.g. a template family forming a near-clique —
    costs O(peel depth) rounds, not O(degeneracy))."""
    edges = _sym(pairs, src, dst).localCheckpoint(eager=True)
    survivors = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    out: list[DataFrame] = []
    k = 2
    rounds = 0
    while not edges.limit(1).isEmpty():
        # peel at threshold k to a fixpoint; at the fixpoint the same
        # degree frame yields the min surviving degree — the next
        # threshold with any work to do (the cheap short-circuiting
        # isEmpty probe stays the per-iteration test; the full min
        # aggregate runs once per stage, not once per round)
        while True:
            deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
            if deg.filter(F.col("__deg") < k).limit(1).isEmpty():
                min_deg = deg.agg(F.min("__deg").alias("m")).first()["m"]
                next_k = (min_deg or k) + 1
                break
            if rounds >= max_rounds:
                raise RuntimeError(
                    f"core_numbers: peel budget exhausted after "
                    f"max_rounds={max_rounds} peeling rounds "
                    f"(adversarial long-chain graphs peel O(n) rounds "
                    f"— raise max_rounds)"
                )
            rounds += 1
            keep = deg.filter(F.col("__deg") >= k).select("src")
            keep = keep.localCheckpoint(eager=True)
            edges = (
                edges.join(keep, on="src", how="leftsemi")
                .join(
                    keep.withColumnRenamed("src", "dst"),
                    on="dst",
                    how="leftsemi",
                )
                .localCheckpoint(eager=True)
            )
        now = (
            edges.select(F.col("src").alias("node"))
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        gone = survivors.join(now, on="node", how="leftanti").select(
            "node", F.lit(k - 1).cast("long").alias("coreness")
        )
        out.append(gone.localCheckpoint(eager=True))
        survivors = now
        k = next_k
    acc = out[0] if out else survivors.select(
        "node", F.lit(0).cast("long").alias("coreness")
    ).limit(0)
    for p in out[1:]:
        acc = acc.unionAll(p)
    return acc


def label_propagation(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    weight: str | None = None,
) -> DataFrame:
    """(node, community) by synchronous label propagation over the
    undirected graph: every node starts in its own community (its own
    id); each round it adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label — fully
    deterministic, unlike classic asynchronous LPA. ``weight`` names
    an edge-weight column for weighted LPA (each round adopts the
    label with the largest incident WEIGHT sum; parallel edge weights
    sum, zero/negative-weight edges drop). A fixed round
    count keeps the loop bounded (LPA has no convergence guarantee;
    5 rounds is the conventional cut). Known synchronous-LPA caveat
    (GraphFrames documents the same): bipartite/star regions can
    oscillate between two label states instead of settling — use
    ``connected_components`` when the graph is a star forest.

    Plan per round: one join to carry neighbor labels, one
    count-aggregation per (node, label), one max_by tie-broken
    reduction — all shuffles keyed on node id. No arrays are
    collected per node (safe for power-law degrees at scale)."""
    if weight is None:
        edges = _sym(pairs, src, dst).withColumn("__w", F.lit(1.0))
    else:
        fwd = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("__w"),
        ).filter(F.col("__w") > 0)
        edges = (
            fwd.unionAll(
                fwd.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    "__w",
                )
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
    edges = edges.localCheckpoint(eager=True)
    # Pinned-layout loop (_fixpoint_conf): edges laid out by dst (the
    # per-round join key) once, labels by node. Per round the whole
    # most-frequent-label step is ONE statement: the (node, label)
    # weight aggregate, a max-over-node window in place of the
    # separate best-aggregate + re-join, and the tie-break min — two
    # exchanges (to (src,community), then to src) instead of the
    # join/agg/join/agg chain. Values are identical: the window max
    # ranges over exactly the same per-(node,label) sums the old
    # best-frame held, and the min tie-break is unchanged.
    spark = pairs.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    with _fixpoint_conf(spark, n) as n_parts:
        ew = edges.repartition(n_parts, "dst").localCheckpoint(eager=True)
        labels = (
            nodes.select("node", F.col("node").alias("community"))
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
        vl = _loop_view(labels, "lpa_labels")
        ve = _loop_view(ew, "lpa_edges")
        round_sql = f"""
            SELECT node, min(community) AS community
            FROM (
              SELECT src AS node, community, sum(__w) AS __n,
                     max(sum(__w)) OVER (PARTITION BY src) AS __m
              FROM {ve} e JOIN {vl} l ON e.dst = l.node
              GROUP BY src, community
            )
            WHERE __n = __m
            GROUP BY node
        """
        try:
            for _ in range(n_iter):
                labels.createOrReplaceTempView(vl)
                labels = spark.sql(round_sql).localCheckpoint(eager=True)
        finally:
            spark.catalog.dropTempView(vl)
            spark.catalog.dropTempView(ve)
    return labels


def modularity(
    pairs: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> float:
    """Newman modularity Q of a community ``assignment`` (columns
    ``node, community``) over the undirected simple graph of
    ``pairs``: Q = Σ_c (e_c/m − (d_c/2m)²), where e_c counts
    intra-community edges, d_c sums member degrees and m is the edge
    total. ``weight`` names an edge-weight column for the weighted
    form (Newman 2004: weight sums replace the counts). The standard
    quality score for a label-propagation / Louvain clustering
    (Q > ~0.3 reads as real structure) — pass the same ``weight`` you
    gave :func:`louvain` / :func:`label_propagation` so the metric
    scores what the algorithm optimized.

    Plan: two broadcast-sized aggregations (per-community edge and
    degree sums) folded into one driver scalar — the metric is a
    single float, so the final collect is one row."""
    per_c = modularity_table(
        pairs, assignment, src=src, dst=dst, weight=weight
    )
    row = per_c.select(F.sum("contribution").alias("q")).first()
    return float(row["q"] or 0.0)


def modularity_table(
    pairs: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Per-community modularity decomposition: (community, e_c
    intra-community edge count, d_c degree sum, m total edge count,
    q_num, contribution). Summing ``contribution`` =
    e_c/m − (d_c/2m)² gives Newman Q — :func:`modularity` does
    exactly that — and the per-community rows localize WHERE the
    structure (or its absence) lives, which is what one actually
    inspects when a clustering underperforms.

    Unweighted, ``q_num`` = 4·m·e_c − d_c² is the EXACT integer
    numerator of the contribution over the common denominator 4m²
    (contribution = q_num / 4m²) — bit-identical on any engine, so
    cross-engine comparisons should use it rather than the float (a
    1-ulp ``pow`` difference survives rounding at boundary values;
    the float here is computed with plain multiplication for the same
    reason).

    ``weight`` switches to the weighted decomposition (Newman 2004):
    e_c = intra-community weight sum, d_c = strength (weighted
    degree) sum, m = total weight — same column NAMES, double type —
    with parallel edge weights pre-summed and zero/negative-weight
    edges dropped (the :func:`louvain` / :func:`label_propagation`
    convention). The exact-integer compare property is unweighted-
    only; weighted q_num is just 4m²·contribution as a float.

    Plan shape: the deduplicated undirected edge list is computed
    once (localCheckpoint) and feeds the edge total m, the
    intra-edge aggregate and the degree aggregate; community sums
    are community-cardinality-sized. Empty graph -> empty frame."""
    if weight is not None:
        return _modularity_table_weighted(pairs, assignment, src, dst, weight)
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    m = e.count()
    asg = assignment.select(
        F.col(assignment.columns[0]).alias("node"),
        F.col(assignment.columns[1]).alias("community"),
    ).dropDuplicates(["node"])
    if m == 0:
        ctype = asg.schema["community"].dataType.simpleString()
        return e.sparkSession.createDataFrame(
            [],
            f"community {ctype}, e_c long, d_c long, m long,"
            " q_num decimal(38,0), contribution double",
        )
    tagged = (
        e.join(asg.withColumnRenamed("node", "u"), on="u")
        .withColumnRenamed("community", "cu")
        .join(asg.withColumnRenamed("node", "v"), on="v")
        .withColumnRenamed("community", "cv")
    )
    intra = (
        tagged.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").alias("e_c"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    dsum = (
        deg.join(asg, on="node")
        .groupBy("community")
        .agg(F.sum("deg").alias("d_c"))
    )
    ec = F.coalesce(F.col("e_c"), F.lit(0)).cast("long")
    dc = F.col("d_c").cast("long")
    # q_num = 4*m*e_c - d_c^2 in decimal(38,0): int64 overflows once
    # m exceeds ~1.5e9 edges (4m^2 > 2^63), which a 100 TB-scale
    # graph reaches routinely; decimal keeps the value EXACT to 38
    # digits (m up to ~1e13 edges), preserving the bit-identical
    # cross-engine compare this column exists for
    q_num = (
        F.lit(4 * m).cast("decimal(19,0)") * ec.cast("decimal(19,0)")
        - dc.cast("decimal(19,0)") * dc.cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    return dsum.join(intra, on="community", how="left").select(
        "community",
        ec.alias("e_c"),
        dc.alias("d_c"),
        F.lit(m).cast("long").alias("m"),
        q_num.alias("q_num"),
        (
            q_num.cast("double")
            / F.lit(4.0 * float(m) * float(m))
        ).alias("contribution"),
    )


def _modularity_table_weighted(
    pairs: DataFrame,
    assignment: DataFrame,
    src: str,
    dst: str,
    weight: str,
) -> DataFrame:
    """Weighted branch of :func:`modularity_table` — same skeleton
    (one pinned edge frame feeding the total, the intra aggregate and
    the strength aggregate) with weight sums in place of counts."""
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
            F.col(weight).cast("double").alias("__w"),
        )
        .filter((F.col("u") != F.col("v")) & (F.col("__w") > 0))
        .groupBy("u", "v")
        .agg(F.sum("__w").alias("__w"))
        .localCheckpoint(eager=True)
    )
    m = float(e.agg(F.sum("__w")).first()[0] or 0.0)
    asg = assignment.select(
        F.col(assignment.columns[0]).alias("node"),
        F.col(assignment.columns[1]).alias("community"),
    ).dropDuplicates(["node"])
    if m == 0.0:
        ctype = asg.schema["community"].dataType.simpleString()
        return e.sparkSession.createDataFrame(
            [],
            f"community {ctype}, e_c double, d_c double, m double,"
            " q_num double, contribution double",
        )
    tagged = (
        e.join(asg.withColumnRenamed("node", "u"), on="u")
        .withColumnRenamed("community", "cu")
        .join(asg.withColumnRenamed("node", "v"), on="v")
        .withColumnRenamed("community", "cv")
    )
    intra = (
        tagged.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.sum("__w").alias("e_c"))
    )
    deg = (
        e.select(F.col("u").alias("node"), "__w")
        .unionAll(e.select(F.col("v").alias("node"), "__w"))
        .groupBy("node")
        .agg(F.sum("__w").alias("deg"))
    )
    dsum = (
        deg.join(asg, on="node")
        .groupBy("community")
        .agg(F.sum("deg").alias("d_c"))
    )
    ec = F.coalesce(F.col("e_c"), F.lit(0.0))
    dc = F.col("d_c").cast("double")
    return dsum.join(intra, on="community", how="left").select(
        "community",
        ec.alias("e_c"),
        dc.alias("d_c"),
        F.lit(m).alias("m"),
        (F.lit(4.0 * m) * ec - dc * dc).alias("q_num"),
        (
            (F.lit(4.0 * m) * ec - dc * dc) / F.lit(4.0 * m * m)
        ).alias("contribution"),
    )


def _partition_min_propagate(
    edges: DataFrame, nodes: DataFrame, max_iter: int
) -> DataFrame:
    """Directed min-label propagation WITHIN partitions: ``edges`` is
    (src, dst, p), ``nodes`` is (node, p); returns (node, p, m) where
    m = min id over the node itself and everything that reaches it
    along edge direction inside its partition. Semi-naive: each round
    one equi-join + one min-aggregate, lineage truncated."""
    lab = nodes.select("node", "p", F.col("node").alias("m")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(
                lab.withColumnRenamed("node", "src"), on=["src", "p"]
            )
            .select(F.col("dst").alias("node"), "p", "m")
        )
        new = (
            lab.unionAll(nbr)
            .groupBy("node", "p")
            .agg(F.min("m").alias("m"))
            .localCheckpoint(eager=True)
        )
        converged = (
            new.join(
                lab.withColumnRenamed("m", "old"), on=["node", "p"]
            )
            .filter(F.col("m") != F.col("old"))
            .isEmpty()
        )
        lab = new
        if converged:
            break
    return lab


def strongly_connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) over the DIRECTED graph of ``pairs``:
    component = the minimum node id in the node's strongly connected
    component. The directed sibling of ``connected_components`` —
    cycle detection, dependency condensation, link-graph analysis.

    Algorithm (FW-BW-MIN, the standard distributed SCC): per round,
    compute each node's forward-min f(v) (smallest id among v and its
    ancestors) and backward-min b(v) (smallest id among v and its
    descendants) WITHIN its current partition. Nodes with f = b are
    mutually reachable with that pivot — their SCC is settled and
    removed. SCCs never span different (f, b) classes, so the
    remaining nodes re-partition by the exact (p, f, b) string key and
    iterate. Rounds needed = recursion depth of the partition
    refinement (small on real graphs: every round settles at least
    each partition's pivot SCC); an exhausted ``max_rounds`` raises —
    never a silently under-merged answer.

    Scale shape: every step is an equi-join or a min-aggregate keyed
    on (node, partition); no arrays, no driver-side graph state. The
    partition key is an exact concatenated string (grows one id per
    round, bounded by max_rounds) — exactness over a hashed key's
    2^-64 cross-partition leak."""
    e = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    work_nodes = nodes.select(
        "node", F.lit("r").alias("p")
    ).localCheckpoint(eager=True)
    settled_parts: list = []
    for _ in range(max_rounds):
        node_p = work_nodes
        ep = (
            e.join(node_p.withColumnRenamed("node", "src"), on="src")
            .withColumnRenamed("p", "ps")
            .join(node_p.withColumnRenamed("node", "dst"), on="dst")
            .filter(F.col("ps") == F.col("p"))
            .select("src", "dst", "p")
            .localCheckpoint(eager=True)
        )
        fwd = _partition_min_propagate(ep, node_p, max_iter)
        bwd = _partition_min_propagate(
            ep.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "p"
            ),
            node_p,
            max_iter,
        )
        joined = fwd.join(
            bwd.withColumnRenamed("m", "mb"), on=["node", "p"]
        ).localCheckpoint(eager=True)
        settled = joined.filter(F.col("m") == F.col("mb")).select(
            "node", F.col("m").alias("component")
        )
        settled_parts.append(settled.localCheckpoint(eager=True))
        rest = joined.filter(F.col("m") != F.col("mb"))
        if rest.isEmpty():
            out = settled_parts[0]
            for part in settled_parts[1:]:
                out = out.unionAll(part)
            return out
        work_nodes = rest.select(
            "node",
            F.concat_ws(
                "|", F.col("p"), F.col("m").cast("string"),
                F.col("mb").cast("string"),
            ).alias("p"),
        ).localCheckpoint(eager=True)
    raise RuntimeError(
        "strongly_connected_components: partition refinement did not "
        f"settle within max_rounds={max_rounds} — raise max_rounds "
        "(each round is one forward + one backward propagation)"
    )


def closeness_centrality(
    pairs: DataFrame,
    sources: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    max_iter: int = 50,
    weight: str | None = None,
) -> DataFrame:
    """(node, n_reached, sum_hops, closeness, harmonic) per source
    node: closeness = n_reached / sum_hops over the nodes it reaches
    (0.0 for isolated nodes), harmonic = sum(1/hops) — the variant
    that stays well-defined across disconnected graphs.

    ``weight`` names an edge-weight column for the weighted form:
    distances become minimum path COSTS (per-origin semi-naive
    Bellman-Ford — the :func:`sssp` relaxation keyed by origin) and
    ``sum_hops`` carries the cost sums as doubles under the same
    column names. Weight conventions for a DISTANCE metric: parallel
    edges take the CHEAPEST weight (min — unlike the flow-style
    operators, where parallel weights sum), zero/negative drop.

    One multi-source BFS keyed by origin: state rows are
    (origin, node, hops), each round joins only the last frontier
    against the edges (semi-naive), so total work is
    O(|sources| x edges reached) — exact closeness over every node is
    quadratic by definition; at scale pass a SAMPLE of nodes as
    ``sources`` (the estimate is unbiased under uniform sampling,
    scale by N/|sources| if an absolute total is needed).
    """
    if weight is not None:
        w_base = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("__w"),
        ).filter((F.col("__w") > 0) & (F.col("src") != F.col("dst")))
        if not directed:
            w_base = w_base.unionAll(
                w_base.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "__w"
                )
            )
        w_edges = (
            w_base.groupBy("src", "dst")
            .agg(F.min("__w").alias("__w"))
            .localCheckpoint(eager=True)
        )
        if sources is None:
            sources = w_edges.select(F.col("src").alias("node")).unionAll(
                w_edges.select(F.col("dst").alias("node"))
            )
        origins = (
            sources.select(F.col(sources.columns[0]).alias("origin"))
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        state = origins.select(
            "origin",
            F.col("origin").alias("node"),
            F.lit(0.0).alias("hops"),
        ).localCheckpoint(eager=True)
        frontier = state
        for _ in range(max_iter):
            cand = (
                frontier.select("origin", F.col("node").alias("src"), "hops")
                .join(w_edges, on="src")
                .groupBy("origin", F.col("dst").alias("node"))
                .agg(F.min(F.col("hops") + F.col("__w")).alias("__new"))
            )
            improved = (
                cand.join(
                    state.withColumnRenamed("hops", "__old"),
                    on=["origin", "node"],
                    how="left",
                )
                .filter(
                    F.col("__old").isNull() | (F.col("__new") < F.col("__old"))
                )
                .select("origin", "node", F.col("__new").alias("hops"))
                .localCheckpoint(eager=True)
            )
            if improved.isEmpty():
                break
            # distances RELAX (unlike the BFS hop states), so the
            # merged state re-pins each round — the sssp shape
            state = (
                state.unionAll(improved)
                .groupBy("origin", "node")
                .agg(F.min("hops").alias("hops"))
                .localCheckpoint(eager=True)
            )
            frontier = improved
        else:
            raise RuntimeError(
                "closeness_centrality: distances were still relaxing "
                f"after max_iter={max_iter} rounds — a truncated "
                "Bellman-Ford would overstate every unfinished "
                "distance; raise max_iter (rounds needed = the max "
                "EDGE COUNT of any minimum-cost path, which can reach "
                "V-1 when many cheap hops undercut a direct edge)"
            )
        return _closeness_from_state(origins, state)
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .dropDuplicates()
        if directed
        else _sym(pairs, src, dst)
    ).localCheckpoint(eager=True)
    if sources is None:
        sources = edges.select(F.col("src").alias("node")).unionAll(
            edges.select(F.col("dst").alias("node"))
        )
    origins = (
        sources.select(F.col(sources.columns[0]).alias("origin"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    state = origins.select(
        "origin",
        F.col("origin").alias("node"),
        F.lit(0).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    frontier = state
    for hop in range(1, max_iter + 1):
        reached = (
            frontier.select("origin", F.col("node").alias("src"))
            .join(edges, on="src")
            .select("origin", F.col("dst").alias("node"))
            .dropDuplicates()
            .join(state.select("origin", "node"), on=["origin", "node"], how="leftanti")
            .select("origin", "node", F.lit(hop).cast("long").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if reached.isEmpty():
            break
        # settled (origin, node, hops) rows never change — accumulate
        # as a union of the pinned per-hop frontiers instead of
        # re-checkpointing the whole state every round (same
        # rationale as shortest_hops)
        state = state.unionAll(reached)
        frontier = reached
    else:
        raise RuntimeError(
            "closeness_centrality: the BFS frontier was still growing "
            f"after max_iter={max_iter} rounds — a truncated sum would "
            "silently understate every distance; raise max_iter above "
            "the graph's diameter"
        )
    return _closeness_from_state(origins, state)


def _closeness_from_state(origins: DataFrame, state: DataFrame) -> DataFrame:
    """Fold (origin, node, hops) distance state into the closeness
    output frame — shared by the BFS (long hops) and weighted
    Bellman-Ford (double costs) branches."""
    per = (
        state.filter(F.col("hops") > 0)
        .groupBy("origin")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum("hops").alias("sum_hops"),
            F.sum(F.lit(1.0) / F.col("hops")).alias("harmonic"),
        )
    )
    return (
        origins.join(per, on="origin", how="left")
        .select(
            F.col("origin").alias("node"),
            F.coalesce("n_reached", F.lit(0)).alias("n_reached"),
            F.coalesce("sum_hops", F.lit(0)).alias("sum_hops"),
            F.when(
                F.coalesce("sum_hops", F.lit(0)) > 0,
                F.col("n_reached") / F.col("sum_hops"),
            ).otherwise(F.lit(0.0)).alias("closeness"),
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
        )
    )


def _dag_rank(state: DataFrame) -> DataFrame:
    """dense_rank(dist) - 1 per origin over settled (origin, node,
    dist) rows — the shortest-path DAG's topological layering in ONE
    window shuffle, partitioned by origin (never SinglePartition;
    pinned by tests/test_plan_shape.py)."""
    return state.withColumn(
        "rk",
        F.dense_rank().over(
            Window.partitionBy("origin").orderBy(F.col("dist"))
        )
        - 1,
    )


def _betweenness_weighted(
    pairs: DataFrame,
    sources: DataFrame | None,
    src: str,
    dst: str,
    directed: bool,
    max_iter: int,
    weight: str,
) -> DataFrame:
    """Weighted Brandes (positive INTEGRAL weights — the sssp guard:
    the shortest-path-DAG membership test is the exact equality
    ``dist(u) + w == dist(v)``, which only never-misses when every
    distance is an exact long; pre-scale fractional weights to
    integers, e.g. cents). Weight conventions for a DISTANCE metric
    match weighted closeness: parallel edges take the CHEAPEST weight
    (min), zero/negative/NULL drop.

    Shape: (1) per-origin semi-naive Bellman-Ford settles
    dist(origin, node) — the sssp relaxation keyed by origin;
    (2) ONE dense_rank window per origin turns distances into a
    topological layering of the shortest-path DAG (every DAG
    predecessor has a strictly smaller distance, hence a smaller
    rank — no iterative level computation needed); (3) forward sigma
    accumulates per rank level over the explicit DAG edges (Brandes'
    counting); (4) the backward dependency pass descends the ranks,
    joining each level's DAG out-edges against the ACCUMULATED
    settled suffix (a weighted DAG successor may sit any number of
    ranks above, not exactly one as in BFS). Every shuffle is keyed
    on (origin, node); per-round frames are localCheckpoint-pinned.
    Exact all-sources betweenness is O(V x E) by definition — at
    scale pass a SAMPLE of nodes as ``sources`` (Brandes-Pich)."""
    from pyspark.sql import types as T

    wtype = pairs.schema[weight].dataType
    if not isinstance(
        wtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            "betweenness_centrality(weight=...) requires integral "
            f"weights, got {wtype.simpleString()}; the shortest-path "
            "DAG test dist(u) + w == dist(v) needs exact arithmetic — "
            "scale fractional weights to integers first"
        )
    w_base = pairs.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).filter(
        F.col("w").isNotNull() & (F.col("w") > 0) & (F.col("src") != F.col("dst"))
    )
    if not directed:
        w_base = w_base.unionAll(
            w_base.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    edges = (
        w_base.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    origins = (
        all_nodes.select(F.col("node").alias("origin"))
        if sources is None
        else sources.select(
            F.col(sources.columns[0]).alias("origin")
        ).dropDuplicates()
    ).localCheckpoint(eager=True)
    # -- (1) Bellman-Ford: settle dist(origin, node), semi-naive ------
    state = origins.select(
        "origin",
        F.col("origin").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = state
    for _ in range(max_iter):
        cand = (
            frontier.select("origin", F.col("node").alias("src"), "dist")
            .join(edges, on="src")
            .groupBy("origin", F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("__new"))
        )
        improved = (
            cand.join(
                state.withColumnRenamed("dist", "__old"),
                on=["origin", "node"],
                how="left",
            )
            .filter(F.col("__old").isNull() | (F.col("__new") < F.col("__old")))
            .select("origin", "node", F.col("__new").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        state = (
            state.unionAll(improved)
            .groupBy("origin", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    else:
        raise RuntimeError(
            "betweenness_centrality: distances were still relaxing "
            f"after max_iter={max_iter} rounds — a truncated "
            "Bellman-Ford would corrupt the shortest-path DAG; raise "
            "max_iter (rounds needed = the max EDGE COUNT of any "
            "minimum-cost path)"
        )
    # -- (2) rank = dense_rank(dist) per origin: a topological
    #    layering of the DAG in one window shuffle (partitioned by
    #    origin — never SinglePartition; plan-pinned on _dag_rank)
    ranked = _dag_rank(state).localCheckpoint(eager=True)
    max_rank = ranked.agg(F.max("rk")).first()[0] or 0
    # explicit shortest-path DAG: u -> v iff dist(u) + w == dist(v)
    dag = (
        ranked.select("origin", F.col("node").alias("src"), "dist")
        .join(edges, on="src")
        .join(
            ranked.select(
                "origin",
                F.col("node").alias("dst"),
                F.col("dist").alias("__dd"),
                F.col("rk").alias("__rkd"),
            ),
            on=["origin", "dst"],
        )
        .filter(F.col("dist") + F.col("w") == F.col("__dd"))
        .select("origin", "src", "dst", F.col("__rkd").alias("rk_dst"))
        .localCheckpoint(eager=True)
    )
    # -- (3) forward sigma, rank level by rank level -------------------
    levels: list[DataFrame] = [
        ranked.filter(F.col("rk") == 0).select(
            "origin", "node", F.lit(1).cast("double").alias("sigma")
        ).localCheckpoint(eager=True)
    ]
    settled = levels[0]
    for r in range(1, max_rank + 1):
        nxt = (
            dag.filter(F.col("rk_dst") == r)
            .join(
                settled.select(
                    "origin", F.col("node").alias("src"), "sigma"
                ),
                on=["origin", "src"],
            )
            .groupBy("origin", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        levels.append(nxt)
        settled = settled.unionAll(nxt)
    # -- (4) backward dependencies, descending ranks -------------------
    upper = levels[max_rank].withColumn("delta", F.lit(0.0))
    parts = [upper]
    upperall = upper
    for r in range(max_rank - 1, -1, -1):
        cur = levels[r]
        contrib = (
            cur.select("origin", F.col("node").alias("src"), "sigma")
            .join(dag.select("origin", "src", "dst"), on=["origin", "src"])
            .join(
                upperall.select(
                    "origin",
                    F.col("node").alias("dst"),
                    F.col("sigma").alias("sigma_w"),
                    F.col("delta").alias("delta_w"),
                ),
                on=["origin", "dst"],
            )
            .groupBy("origin", F.col("src").alias("node"))
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sigma_w"))
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("acc")
            )
        )
        done = (
            cur.join(contrib, on=["origin", "node"], how="left")
            .withColumn("delta", F.coalesce("acc", F.lit(0.0)))
            .drop("acc")
            .localCheckpoint(eager=True)
        )
        parts.append(done)
        upperall = upperall.unionAll(done)
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionAll(p)
    per_node = (
        delta.filter(F.col("node") != F.col("origin"))
        .groupBy("node")
        .agg(F.sum("delta").alias("betweenness"))
    )
    scale = F.col("betweenness") / 2 if not directed else F.col("betweenness")
    return all_nodes.join(per_node, on="node", how="left").select(
        "node",
        F.coalesce(scale, F.lit(0.0)).alias("betweenness"),
    )


def betweenness_centrality(
    pairs: DataFrame,
    sources: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    max_iter: int = 50,
    weight: str | None = None,
) -> DataFrame:
    """(node, betweenness) — Brandes' algorithm as DataFrame rounds.

    ``weight`` names an edge-weight column for the weighted form
    (positive integral weights; see :func:`_betweenness_weighted` for
    the conventions) — the unweighted plan below is bitwise-unchanged
    when ``weight`` is None, the family convention.

    Forward: a multi-source BFS keyed by origin settles each node's
    level and shortest-path count sigma (sigma sums over the level-k
    predecessors when level k+1 settles — exactly Brandes' counting).
    Backward: dependencies accumulate level by level, deepest first:
    delta(v) = sum over successors w of sigma(v)/sigma(w)*(1+delta(w));
    betweenness(v) = sum of delta(v) over all origins, halved for
    undirected graphs (each path is seen from both ends).

    Exact betweenness from every source is O(V x E) by definition —
    the classic result; at scale pass a SAMPLE of nodes as
    ``sources`` (Brandes-Pich estimation: scale by N/|sources|).
    Rounds = 2 x BFS depth; each round is bounded equi-joins with
    per-round ``localCheckpoint`` lineage truncation.
    """
    if weight is not None:
        return _betweenness_weighted(
            pairs, sources, src, dst, directed, max_iter, weight
        )
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .dropDuplicates()
        if directed
        else _sym(pairs, src, dst)
    ).localCheckpoint(eager=True)
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    origins = (
        all_nodes.select(F.col("node").alias("origin"))
        if sources is None
        else sources.select(F.col(sources.columns[0]).alias("origin")).dropDuplicates()
    ).localCheckpoint(eager=True)
    # r13: both passes run under the pinned static layout (AQE off so
    # per-level checkpoints keep their hash layout and exchanges stop
    # materializing one job each; size-derived partitions) — the
    # settled state is at most |origins| x |nodes| rows, the honest
    # upper bound for the layout sizer. The edge frame is laid out by
    # src ONCE (both passes join on src), never per level.
    n_state = origins.count() * all_nodes.count()
    with _fixpoint_conf(edges.sparkSession, n_state) as n_parts:
        return _betweenness_unweighted_inner(
            edges.repartition(n_parts, "src").localCheckpoint(eager=True),
            all_nodes, origins, directed, max_iter,
        )


def _betweenness_unweighted_inner(
    edges: DataFrame,
    all_nodes: DataFrame,
    origins: DataFrame,
    directed: bool,
    max_iter: int,
) -> DataFrame:
    """Both Brandes passes of :func:`betweenness_centrality`, run
    under the caller's pinned layout. Per-level checkpoints are LAZY
    (walk-loop discipline): the forward pass's one ``isEmpty`` probe
    per level materializes that level, the backward pass rides the
    final action; math is expression-identical either way."""
    # -- forward: settle (origin, node) -> (lvl, sigma), level by level
    state = origins.select(
        "origin",
        F.col("origin").alias("node"),
        F.lit(0).alias("lvl"),
        F.lit(1).cast("double").alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = state
    levels = [state]  # per-level checkpoints; settled rows never change
    depth = 0
    for lvl in range(1, max_iter + 1):
        nxt = (
            frontier.select("origin", F.col("node").alias("src"), "sigma")
            .join(edges, on="src")
            .groupBy("origin", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(state.select("origin", "node"), on=["origin", "node"], how="leftanti")
            .select("origin", "node", F.lit(lvl).alias("lvl"), "sigma")
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        # accumulate as a union of the pinned level frames instead of
        # re-checkpointing the whole state each round (hops/sigma are
        # final once settled — same rationale as shortest_hops)
        state = state.unionAll(nxt)
        levels.append(nxt)
        frontier = nxt
        depth = lvl
    else:
        raise RuntimeError(
            "betweenness_centrality: the BFS frontier was still growing "
            f"after max_iter={max_iter} rounds — truncated levels would "
            "corrupt every dependency; raise max_iter above the graph's "
            "diameter"
        )
    # -- backward: each (origin, node)'s delta is a function of the
    # level ABOVE it only, so it is computed exactly once — process
    # one level frame at a time (per-round work ∝ that level's size,
    # never the whole state: the shape that survives deep graphs);
    # the per-level frames are already in hand from the forward pass
    upper = levels[depth].withColumn("delta", F.lit(0.0))
    parts = [upper]
    for lvl in range(depth - 1, -1, -1):
        cur = levels[lvl]
        contrib = (
            cur.select("origin", F.col("node").alias("src"), "sigma")
            .join(edges, on="src")
            .join(
                upper.select(
                    "origin",
                    F.col("node").alias("dst"),
                    F.col("sigma").alias("sigma_w"),
                    F.col("delta").alias("delta_w"),
                ),
                on=["origin", "dst"],
            )
            .groupBy("origin", F.col("src").alias("node"))
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sigma_w"))
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("acc")
            )
        )
        upper = (
            cur.join(contrib, on=["origin", "node"], how="left")
            .withColumn("delta", F.coalesce("acc", F.lit(0.0)))
            .drop("acc")
            .localCheckpoint(eager=False)
        )
        parts.append(upper)
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionAll(p)
    per_node = (
        delta.filter(F.col("node") != F.col("origin"))
        .groupBy("node")
        .agg(F.sum("delta").alias("betweenness"))
    )
    scale = F.col("betweenness") / 2 if not directed else F.col("betweenness")
    return (
        all_nodes.join(per_node, on="node", how="left")
        .select(
            "node",
            F.coalesce(scale, F.lit(0.0)).alias("betweenness"),
        )
    )


def node_similarity(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    threshold: float = 0.0,
    max_degree: int | None = None,
) -> DataFrame:
    """(a, b, n_common, jaccard) for node pairs sharing at least one
    neighbor, a < b: jaccard = |N(a) & N(b)| / |N(a) | N(b)| over
    (out-)neighbor sets.

    Scale shape: candidates come only from the common-neighbor
    equi-join (never all pairs); a neighbor of degree d contributes
    d*(d-1)/2 candidate pairs, so hot hubs dominate — ``max_degree``
    drops neighbors above the cap from candidate GENERATION only
    (pairs whose every common neighbor is a hub are lost — the
    standard mitigation); surviving candidates are then re-counted
    against the FULL neighbor set (the bucketed-candidates +
    exact-verify shape used across this repo), so every emitted
    (n_common, jaccard) is exact."""
    nbrs = (
        pairs.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .dropDuplicates()
        if directed
        else _sym(pairs, src, dst).select(
            F.col("src").alias("node"), F.col("dst").alias("nbr")
        )
    ).localCheckpoint(eager=True)
    deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # r13: same single-task wedge-expansion hazard as
    # link_prediction — spread the (materialized, so the partition
    # probe is free) neighbor table up to the core count before the
    # self-join; no-op at corpus scale.
    gen = nbrs
    if nbrs.rdd.getNumPartitions() < (cores := pairs.sparkSession.sparkContext.defaultParallelism):
        gen = gen.repartition(cores)
    if max_degree is not None:
        nbr_deg = nbrs.groupBy("nbr").agg(F.count(F.lit(1)).alias("nd"))
        gen = nbrs.join(
            nbr_deg.filter(F.col("nd") <= max_degree).select("nbr"),
            on="nbr",
            how="leftsemi",
        )
    common = (
        gen.select(F.col("node").alias("a"), "nbr")
        .join(gen.select(F.col("node").alias("b"), "nbr"), on="nbr")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if max_degree is not None:
        # exact-verify: re-count common neighbors of the surviving
        # candidates over the uncapped neighbor set
        common = (
            common.select("a", "b")
            .join(nbrs.select(F.col("node").alias("a"), "nbr"), on="a")
            .join(
                nbrs.select(F.col("node").alias("b"), "nbr"),
                on=["b", "nbr"],
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    return (
        common.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), on="a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), on="b")
        .select(
            "a",
            "b",
            "n_common",
            (
                F.col("n_common")
                / (F.col("da") + F.col("db") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def _pin(df: DataFrame) -> DataFrame:
    """Materialize an iterative-loop state frame with BOTH plan
    truncation and sane statistics: persist -> count -> localCheckpoint
    -> unpersist. Each half matters for a loop whose round r+1 plan
    references round r's frame several times:

    - WITHOUT the checkpoint, the analyzed logical tree multiplies
      per round (k references x r rounds = k^r nodes) until plan
      strings alone OOM the driver (observed: AdaptiveSparkPlanExec
      explainString at 8g heap).
    - WITHOUT the cache hop, localCheckpoint copies the PLAN's stats
      onto the LogicalRDD, and join-stats are BigInt PRODUCTS of the
      children — round r+1's checkpoint stats are round r's raised to
      the #joins power, and by round ~8 the optimizer spends minutes
      in Toom-Cook BigInteger multiplies (jstack-verified under
      LogicalRDD.rewriteStatsAndConstraints).

    Checkpointing THROUGH InMemoryRelation truncates the lineage AND
    stamps the real cached byte count as the stats — small and
    non-compounding."""
    cached = df.persist()
    cached.count()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def _louvain_moves(
    edges: DataFrame, labels: DataFrame, two_m: float, n_rounds: int
) -> DataFrame:
    """The Louvain local-move phase, synchronous and deterministic:
    each round every node considers its neighbor communities (plus
    its own) and takes the one maximizing the modularity gain
    proxy k_u(c) − deg_u·tot(c)/2m (Blondel et al. 2008 eq. 2 with
    the constant terms dropped), ties broken by the SMALLEST
    community id; a node moves only on strictly positive advantage
    over staying. Two guards break the synchronous-swap cycles that
    plague parallel Louvain (adjacent nodes trading communities
    forever): the MINIMUM-LABEL rule (Lu, Halappanavar &
    Kalyanaraman 2015 — a singleton may move to another singleton
    only toward the smaller community id, so the lower-id one waits
    and absorbs) and TWO-CLASS alternation (each round only the
    md5-parity half of the nodes is move-eligible — the
    graph-coloring trick at its cheapest, deterministic under any
    partitioning AND replayable by any engine with md5, which is
    what lets the DuckDB oracle unroll the rounds). Residual cycles on adversarial symmetric
    structures are bounded by ``n_rounds`` (the caveat
    label_propagation also documents); convergence = two consecutive
    quiet rounds (one per class). ``edges`` is the symmetric
    weighted edge list (src, dst, w); ``labels`` is
    (node, community).

    Plan per round: degree/tot aggregates (community-cardinality-
    sized, broadcast-friendly), one join to tag neighbor communities,
    one (node, community) weight aggregate, one max_by reduction —
    every shuffle keyed on node id, no per-node arrays."""
    # degree INCLUDES self-loop weight (a contracted supernode's
    # degree is the sum of its members' degrees — that is exactly the
    # doubled internal weight the symmetric list folds into its self
    # edge); k_u(c) EXCLUDES self-edges (a node's own loop moves with
    # it, contributing identically to Q wherever it sits, so counting
    # it on the stay side would bias every supernode toward staying)
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    labels = _pin(labels)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("deg")
    ).localCheckpoint(eager=True)
    # r13 pinned layout: the only per-round consumer of ext joins it
    # on dst, so lay it out by dst ONCE before the rounds (inside
    # _fixpoint_conf the shuffle.partitions match, so the per-round
    # k_uc join reuses this layout with no new exchange)
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    ext = (
        edges.filter(F.col("src") != F.col("dst"))
        .repartition(n_parts, "dst")
        .localCheckpoint(eager=True)
    )
    quiet = 0
    for r in range(n_rounds):
        tot = (
            labels.join(deg, on="node")
            .groupBy("community")
            .agg(F.sum("deg").alias("tot"), F.count("*").alias("csize"))
        )
        # weight from u into each neighbor community c: k_u(c)
        k_uc = (
            ext.join(
                labels.withColumnRenamed("node", "dst").withColumnRenamed(
                    "community", "c"
                ),
                on="dst",
            )
            .groupBy(F.col("src").alias("node"), "c")
            .agg(F.sum("w").alias("k"))
        )
        # guarantee a row for the CURRENT community (k=0 when u has no
        # direct edge into it) so the stay-gain baseline always exists
        # and the move test compares true gains, never a 0.0 stand-in
        k_uc = (
            k_uc.unionByName(
                labels.select(
                    "node",
                    F.col("community").alias("c"),
                    F.lit(0.0).alias("k"),
                )
            )
            .groupBy("node", "c")
            .agg(F.max("k").alias("k"))
        )
        # candidate gain of joining c (tot excludes u when u in c, so
        # subtract u's own degree from its current community's total)
        cand = (
            k_uc.join(labels, on="node")
            .join(deg, on="node")
            .join(
                tot.select(
                    F.col("community").alias("c"),
                    "tot",
                    F.col("csize").alias("tsize"),
                ),
                on="c",
            )
            .join(
                tot.select("community", F.col("csize").alias("cursize")),
                on="community",
            )
            .select(
                "node",
                "c",
                (
                    F.col("k")
                    - F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("c") == F.col("community"), F.col("deg")
                        ).otherwise(F.lit(0.0))
                    )
                    / F.lit(two_m)
                ).alias("gain"),
                (F.col("c") == F.col("community")).alias("is_cur"),
                # minimum-label anti-swap rule: a singleton may move to
                # another singleton only toward the SMALLER id
                (
                    (F.col("c") == F.col("community"))
                    | (F.col("cursize") > 1)
                    | (F.col("tsize") > 1)
                    | (F.col("c") < F.col("community"))
                ).alias("allowed"),
            )
        )
        # stay unless some ALLOWED community strictly beats the
        # current one; ties among improvers break to the smallest id
        # argmax by (gain desc, c asc): min_by over (-gain, c) keeps
        # the smallest-id tie-break working for ANY orderable id type
        # (negating c itself would crash on string community ids)
        best = (
            cand.filter(F.col("allowed"))
            .groupBy("node")
            .agg(
                F.min_by(
                    F.struct(F.col("gain"), F.col("c")),
                    F.struct((-F.col("gain")).alias("__ng"), F.col("c")),
                ).alias("b"),
                F.max(
                    F.when(F.col("is_cur"), F.col("gain"))
                ).alias("cur_gain"),
            )
            .select(
                "node",
                F.when(
                    (
                        F.col("b.gain")
                        > F.coalesce(F.col("cur_gain"), F.lit(0.0))
                    )
                    & (
                        # alternation class = md5 parity (the cross-
                        # engine-replayable hash idiom, operators/
                        # hashing.py): any engine with md5 replays
                        # the class split exactly, which is what lets
                        # the DuckDB oracle unroll the rounds
                        F.pmod(md5_prefix_long(F.col("node"), 4), F.lit(2))
                        == F.lit(r % 2)
                    ),
                    F.col("b.c"),
                ).alias("moved"),
            )
        )
        # pin the JOINED frame (still carrying the moved flag): the
        # settled probe then reads the materialized checkpoint with a
        # cheap filter instead of re-joining new vs old labels per
        # round (r13: one fewer per-round job; `moved` is non-null
        # exactly when the node changed community, since the argmax
        # requires a STRICT improvement over the current community)
        joined = _pin(labels.join(best, on="node", how="left"))
        settled = joined.filter(F.col("moved").isNotNull()).isEmpty()
        labels = joined.select(
            "node",
            F.coalesce(F.col("moved"), F.col("community")).alias(
                "community"
            ),
        )
        if settled:
            quiet += 1
            if quiet >= 2:  # both alternation classes settled
                break
        else:
            quiet = 0
    return labels


def louvain(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    levels: int = 2,
    n_rounds: int = 10,
    weight: str | None = None,
) -> DataFrame:
    """(node, community) by Louvain-style modularity optimization
    (Blondel et al. 2008), deterministic. ``weight`` names an edge
    weight column for the weighted form (parallel edge weights sum;
    without it the simple unweighted graph is used): ``levels``
    passes of the
    synchronous local-move phase (:func:`_louvain_moves` —
    modularity-gain argmax per node, smallest-id tie-break, bounded
    rounds, move only on strict improvement) each followed by graph
    COARSENING (communities contract to super-nodes, parallel edge
    weights sum, self-loops kept so supernode degrees equal their
    members' degree sums — the standard Louvain contraction). The one
    documented deviation from the sequential original: moves are
    synchronous with the two anti-swap guards (see
    :func:`_louvain_moves`) — the distributed-Louvain norm, since
    sequential sweeps don't parallelize. Quality is pinned in tests
    via :func:`modularity` on the ORIGINAL graph. Community ids are
    canonical min member ids, so output is
    partitioning-independent.

    Scale shape: each level's graph is community-cardinality-sized —
    the classic Louvain contraction that makes level 2+ nearly free;
    all shuffles are keyed on node/community ids, the assignment
    mapping back through levels is one hash join per level. Fixed
    bounds everywhere (synchronous moves have no convergence
    guarantee; the early-exit fires when a round moves nothing)."""
    if weight is None:
        e = _sym(pairs, src, dst).select(
            "src", "dst", F.lit(1.0).alias("w")
        )
    else:
        # weighted form: symmetric view with PARALLEL EDGE WEIGHTS
        # SUMMED (multigraph semantics; the unweighted path instead
        # dedups to the simple graph), self-loops dropped
        fwd = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        )
        e = (
            fwd.unionAll(
                fwd.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    "w",
                )
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    e = e.localCheckpoint(eager=True)
    if e.isEmpty():
        # typed empty frame: node/community carry the INPUT id type
        # (string doc ids are first-class here, as in the LPA family)
        return e.select(
            F.col("src").alias("node"), F.col("src").alias("community")
        ).limit(0)
    return _louvain_levels(e, levels, n_rounds)


def _louvain_levels(e: DataFrame, levels: int, n_rounds: int) -> DataFrame:
    """The level loop of :func:`louvain`. Runs under the pinned
    static layout of :func:`_fixpoint_conf` (r13): AQE off so the
    ~8-exchange round body stops materializing one job per exchange
    and round r+1 reuses round r's checkpointed hash layout, fixed
    size-derived shuffle partitions, no per-round broadcast builds.
    Float semantics and move decisions are expression-identical; only
    plan shape and partition layout change."""
    spark = e.sparkSession
    two_m = float(
        e.agg(F.sum("w").alias("s")).first()["s"]
    )  # symmetric list already counts each edge twice
    nodes = e.select(F.col("src").alias("node")).dropDuplicates()
    assign = nodes.select(
        "node", F.col("node").alias("community")
    ).localCheckpoint(eager=True)
    n = assign.count()
    with _fixpoint_conf(spark, n):
        return _louvain_levels_inner(e, assign, levels, n_rounds, two_m)


def _louvain_levels_inner(
    e: DataFrame, assign: DataFrame, levels: int, n_rounds: int,
    two_m: float,
) -> DataFrame:
    for _ in range(levels):
        moved = _louvain_moves(
            e, assign.select(F.col("community").alias("node")).dropDuplicates()
            .select("node", F.col("node").alias("community")),
            two_m,
            n_rounds,
        )
        # canonicalize community ids to the min super-node member
        canon = moved.groupBy("community").agg(F.min("node").alias("__c"))
        lab = moved.join(canon, on="community").select(
            "node", F.col("__c").alias("community")
        )
        # map the full assignment through this level's result
        assign = (
            assign.join(
                lab.select(
                    F.col("node").alias("community"),
                    F.col("community").alias("__new"),
                ),
                on="community",
            )
            .select("node", F.col("__new").alias("community"))
            .localCheckpoint(eager=True)
        )
        # coarsen: contract communities, sum parallel weights. Self
        # loops are KEPT — the symmetric list counts every internal
        # edge twice, so the self-loop carries exactly the doubled
        # internal weight that makes a supernode's degree equal the
        # sum of its members' degrees (without it, level-2 gains are
        # computed against starved degrees and distinct communities
        # spuriously merge — the resolution contract the ring-of-
        # cliques test pins)
        contracted = (
            e.join(
                lab.select(
                    F.col("node").alias("src"), F.col("community").alias("cs")
                ),
                on="src",
            )
            .join(
                lab.select(
                    F.col("node").alias("dst"), F.col("community").alias("cd")
                ),
                on="dst",
            )
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        # converged when no inter-community edges remain to optimize
        if contracted.filter(F.col("src") != F.col("dst")).isEmpty():
            break
        e = contracted
    return assign


def link_prediction(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    exclude_existing: bool = True,
    max_degree: int | None = None,
) -> DataFrame:
    """Classic link-prediction scores for candidate node pairs of the
    undirected simple graph of ``pairs`` (a < b, at least one common
    neighbor): ``n_common`` (common-neighbors count),
    ``pref_attachment`` = deg(a)·deg(b) (both exact integers),
    ``adamic_adar`` = Σ_z 1/ln(deg(z)) and ``resource_alloc`` =
    Σ_z 1/deg(z) over common neighbors z — the standard
    neighborhood-based predictors (Liben-Nowell & Kleinberg 2003).
    ``exclude_existing`` keeps only NON-adjacent pairs (the actual
    prediction targets).

    Scale shape: candidates come from the common-neighbor wedge join
    only (the :func:`node_similarity` shape — never all pairs); the
    per-z scores join z's degree BEFORE aggregation, so one
    vocabulary-sized join + one candidate-keyed aggregate.
    ``max_degree`` caps hub explosion in candidate generation (pairs
    connected only through hotter hubs are dropped — documented
    recall trade, same as node_similarity); every common neighbor z
    has deg(z) >= 2 by construction, so 1/ln(deg) is finite. The
    integer scores are engine-exact; the float sums are
    order-sensitive (use the ints for cross-engine comparison)."""
    nbrs = _sym(pairs, src, dst).select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).localCheckpoint(eager=True)
    deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # r13: the wedge self-join below BROADCASTS one side, so its
    # explosive output (Σ deg(z)² rows) is produced on the stream
    # side's partitioning — on a small/AQE-coalesced input that was
    # ONE task doing the entire wedge expansion + partial aggregate
    # (measured sf0.1: a 5.5 s single-task stage in a 5.8 s query).
    # The checkpoint above is materialized, so its partition count is
    # a free metadata read (probing BEFORE the checkpoint would
    # execute the whole upstream plan a second time — measured
    # regression); when the count is sub-core the stream side gets an
    # explicit round-robin spread, which also evens out hot-hub rows
    # (guide §2.5/§2.6). No-op at corpus scale.
    gen = nbrs
    if nbrs.rdd.getNumPartitions() < (cores := pairs.sparkSession.sparkContext.defaultParallelism):
        gen = gen.repartition(cores)
    if max_degree is not None:
        nbr_deg = nbrs.groupBy("nbr").agg(F.count(F.lit(1)).alias("nd"))
        gen = nbrs.join(
            nbr_deg.filter(F.col("nd") <= max_degree).select("nbr"),
            on="nbr",
            how="leftsemi",
        )
    wedges = (
        gen.select(F.col("node").alias("a"), "nbr")
        .join(gen.select(F.col("node").alias("b"), "nbr"), on="nbr")
        .filter(F.col("a") < F.col("b"))
        .join(
            deg.select(F.col("node").alias("nbr"), F.col("deg").alias("zd")),
            on="nbr",
        )
    )
    scores = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(F.lit(1.0) / F.log(F.col("zd"))).alias("adamic_adar"),
        F.sum(F.lit(1.0) / F.col("zd")).alias("resource_alloc"),
    )
    if exclude_existing:
        existing = nbrs.select(
            F.col("node").alias("a"), F.col("nbr").alias("b")
        )
        scores = scores.join(existing, on=["a", "b"], how="leftanti")
    return (
        scores.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("da")),
            on="a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("db")),
            on="b",
        )
        .select(
            "a",
            "b",
            "n_common",
            (F.col("da") * F.col("db")).alias("pref_attachment"),
            "adamic_adar",
            "resource_alloc",
        )
    )


def degree_assortativity(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One-row (n_edges, assortativity): Newman's degree
    assortativity coefficient — the Pearson correlation of endpoint
    degrees over the DIRECTED-pair expansion of the undirected simple
    graph (each edge contributes both (deg_u, deg_v) and
    (deg_v, deg_u), the standard symmetric convention, so r is
    exchange-invariant). r > 0 = hubs attach to hubs (social-network
    shape), r < 0 = hubs attach to leaves (star/dependency shape) —
    the one-number profile that tells you whether hub-cap mitigations
    (max_degree in node_similarity / link_prediction) will bite.

    Plan: one degree aggregate + two id-keyed joins + one 1-row
    correlation aggregate (map-side combinable). Returns NULL
    assortativity when degrees have zero variance (a regular graph —
    undefined, mirroring the corr() convention)."""
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("double").alias("deg"))
    )
    both = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    scored = (
        both.join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), on="u")
        .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), on="v")
    )
    # corr() under ANSI throws DIVIDE_BY_ZERO on zero variance; build
    # the Pearson ratio from pop moments with an explicit guard (the
    # n factors cancel, so this equals corr where corr is defined)
    agg = scored.agg(
        (F.count("*") / 2).cast("long").alias("n_edges"),
        F.covar_pop("du", "dv").alias("__cov"),
        F.stddev_pop("du").alias("__su"),
        F.stddev_pop("dv").alias("__sv"),
    )
    return agg.select(
        "n_edges",
        F.when(
            (F.col("__su") > 0) & (F.col("__sv") > 0),
            F.col("__cov") / (F.col("__su") * F.col("__sv")),
        ).alias("assortativity"),
    )


def eigenvector_centrality(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 20,
    directed: bool = False,
    weight: str | None = None,
) -> DataFrame:
    """(node, score) — eigenvector centrality by synchronous power
    iteration with L2 normalization each round (the textbook/GDS
    formulation: score ∝ the sum of in-neighbors' scores, so a node
    is central when its neighbors are). Fixed ``n_iter`` rounds keep
    the loop bounded and SQL-replayable; on a connected non-bipartite
    graph 20 rounds is well past visual convergence (pin exact values
    against a dense twin, as the tests do, rather than assuming a
    fixpoint). ``weight`` scales each propagated score by the edge
    weight (parallel weights sum, w ≤ 0 drops — the family
    convention; unweighted multiplies by an exact literal 1.0).

    Plan shape per round — identical to one :func:`hits` half-step:
    one equi-join of the score vector against the edge list + one
    sum-aggregate keyed on the receiving node (map-side partial), and
    the L2 norm folds back as a one-row broadcast cross join, no
    driver round-trip. State is |V| doubles, checkpointed per round.
    Nodes with no in-edges decay to 0 (the standard behavior — use
    :func:`pagerank` when teleport mass is wanted)."""
    if weight is None:
        base = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        if not directed:
            base = base.unionAll(
                base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        edges = base.dropDuplicates().withColumn(
            "__w", F.lit(1.0)
        ).localCheckpoint(eager=True)
    else:
        base = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("__w"),
        ).filter(F.col("__w") > 0)
        if not directed:
            base = base.unionAll(
                base.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "__w"
                )
            )
        edges = (
            base.groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
            .localCheckpoint(eager=True)
        )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # Pinned-layout loop (_fixpoint_conf): edges laid out by src (the
    # per-round join key) once; each round is the one contribution
    # shuffle plus a 1-row L2-norm scalar subquery. Float semantics
    # unchanged (same join/aggregate/normalize expressions).
    spark = pairs.sparkSession
    n = nodes.count()
    with _fixpoint_conf(spark, n) as n_parts:
        ew = (
            edges.repartition(n_parts, "src").localCheckpoint(eager=True)
        )
        score = (
            nodes.select("node", F.lit(1.0).alias("score"))
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
        vs = _loop_view(score, "eig_state")
        ve = _loop_view(ew, "eig_edges")
        nrm = "(SELECT sqrt(sum(score * score)) FROM raw)"
        round_sql = f"""
            WITH raw AS (
              SELECT e.dst AS node, sum(e.__w * st.score) AS score
              FROM {ve} e JOIN {vs} st ON e.src = st.node
              GROUP BY e.dst
            )
            SELECT node,
                   CASE WHEN {nrm} > 0 THEN score / {nrm}
                        ELSE 0.0d END AS score
            FROM raw
        """
        try:
            for _ in range(n_iter):
                score.createOrReplaceTempView(vs)
                score = spark.sql(round_sql).localCheckpoint(eager=True)
        finally:
            spark.catalog.dropTempView(vs)
            spark.catalog.dropTempView(ve)
    return nodes.join(score, on="node", how="left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def hits(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    weight: str | None = None,
) -> DataFrame:
    """(node, hub, authority) — Kleinberg's HITS, synchronous power
    iterations with L2 normalization each half-step (the textbook
    formulation, so an unrolled SQL oracle can replay it).
    ``weight`` names an edge-weight column for the weighted form
    (each propagated score multiplies by w; parallel edge weights
    sum, zero/negative drop — the family convention). Unweighted,
    ``__w`` is the exact literal 1.0, so every addend is bitwise what
    it was before the weighted form existed and the pinned oracle
    replays unchanged.

    Per iteration: authority = normalize(A^T h) is one equi-join +
    one aggregation; hub = normalize(A a) the same; each L2 norm is
    a one-row aggregate folded back as a broadcast cross join (the
    PageRank dangling-mass shape — no driver round-trip). State is
    2 x |V| doubles, checkpointed per round."""
    if weight is None:
        edges = (
            pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .dropDuplicates()
            .withColumn("__w", F.lit(1.0))
            .localCheckpoint(eager=True)
        )
    else:
        edges = (
            pairs.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("__w"),
            )
            .filter(F.col("__w") > 0)
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
            .localCheckpoint(eager=True)
        )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    # Pinned-layout loop (_fixpoint_conf): the two half-steps join the
    # edge list on DIFFERENT keys (src for the authority step, dst for
    # the hub step), so the edge frame is laid out TWICE before the
    # loop — two one-time shuffles instead of two per round. Rows
    # absent from a half-step's aggregate are implicit zeros (they
    # change neither the L2 norm nor the next propagation); the
    # 0-fill happens once at the end, as before. Each round: TWO
    # eager checkpoints (auth, then hub). Checkpointing auth is what
    # keeps the per-round plan flat — left lazy, the hub step's plan
    # nests the auth step's scalar subquery inside its own, and
    # subquery reuse does NOT cross that nesting (measured 2.5-9 s
    # PER ROUND at sf0.1 from the recomputation). Float semantics are
    # expression-for-expression unchanged from the crossJoin-norm
    # form this replaces.
    spark = pairs.sparkSession
    n = nodes.count()
    with _fixpoint_conf(spark, n) as n_parts:
        e_src = edges.repartition(n_parts, "src").localCheckpoint(eager=True)
        e_dst = edges.repartition(n_parts, "dst").localCheckpoint(eager=True)
        hub = (
            nodes.select("node", F.lit(1.0).alias("hub"))
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
        auth = nodes.select("node", F.lit(1.0).alias("authority"))
        vh = _loop_view(hub, "hits_hub")
        ves = _loop_view(e_src, "hits_esrc")
        ved = _loop_view(e_dst, "hits_edst")
        va = f"__hits_auth_{next(_VIEW_SEQ)}"
        a_nrm = "(SELECT sqrt(sum(authority * authority)) FROM a_raw)"
        auth_sql = f"""
            WITH a_raw AS (
              SELECT e.dst AS node, sum(e.__w * st.hub) AS authority
              FROM {ves} e JOIN {vh} st ON e.src = st.node
              GROUP BY e.dst
            )
            SELECT node,
                   CASE WHEN {a_nrm} > 0 THEN authority / {a_nrm}
                        ELSE 0.0d END AS authority
            FROM a_raw
        """
        h_nrm = "(SELECT sqrt(sum(hub * hub)) FROM h_raw)"
        hub_sql = f"""
            WITH h_raw AS (
              SELECT e.src AS node, sum(e.__w * a.authority) AS hub
              FROM {ved} e JOIN {va} a ON e.dst = a.node
              GROUP BY e.src
            )
            SELECT node,
                   CASE WHEN {h_nrm} > 0 THEN hub / {h_nrm}
                        ELSE 0.0d END AS hub
            FROM h_raw
        """
        try:
            for _ in range(n_iter):
                hub.createOrReplaceTempView(vh)
                auth = spark.sql(auth_sql).localCheckpoint(eager=True)
                auth.createOrReplaceTempView(va)
                hub = spark.sql(hub_sql).localCheckpoint(eager=True)
        finally:
            for v in (vh, va, ves, ved):
                spark.catalog.dropTempView(v)
    return (
        nodes.join(hub, on="node", how="left")
        .join(auth, on="node", how="left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def ktruss(
    pairs: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(a, b) canonical edges of the k-truss: the maximal subgraph in
    which every edge participates in >= k-2 triangles — the
    EDGE-level cohesion filter (strictly stronger than the (k-1)-core;
    the standard community-backbone extraction over a near-dup or
    co-occurrence graph).

    Plan: iterative edge peel. Per round, each edge's support =
    common-neighbor count, computed as two equi-joins against the
    symmetric adjacency (edges x avg-degree join rows, the same wedge
    shape ``triangle_count`` uses — never per-triangle enumeration);
    edges below support k-2 drop; converge when a round drops
    nothing. Rounds = peeling depth (small on clique-family graphs);
    an exhausted ``max_rounds`` RAISES (house rule: never silently
    return a superset). Lineage truncated per round."""
    if k < 3:
        raise ValueError("k must be >= 3 (k=2 is just the edge set)")
    e = (
        _sym(pairs, src, dst)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        adj = e.select(F.col("a").alias("x"), F.col("b").alias("n")).unionAll(
            e.select(F.col("b").alias("x"), F.col("a").alias("n"))
        )
        sup = (
            e.join(adj.withColumnsRenamed({"x": "a", "n": "w"}), on="a")
            .join(
                adj.withColumnsRenamed({"x": "b", "n": "w"}),
                on=["b", "w"],
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("__sup"))
        )
        kept = (
            e.join(sup.filter(F.col("__sup") >= k - 2), on=["a", "b"], how="leftsemi")
            .localCheckpoint(eager=True)
        )
        if kept.count() == e.count():
            return kept
        e = kept
        if e.isEmpty():
            return e
    raise RuntimeError(
        f"ktruss did not converge within max_rounds={max_rounds} — "
        "raise the budget (result would be a superset, not returned)"
    )


def random_walks(
    pairs: DataFrame,
    walk_len: int = 5,
    n_walks: int = 1,
    src: str = "src",
    dst: str = "dst",
    salt: str = "walk",
    directed: bool = True,
    weight: str | None = None,
) -> DataFrame:
    """Deterministic random walks — the DeepWalk/node2vec corpus
    sampler: ``n_walks`` walks of up to ``walk_len`` steps from every
    node; step s of walk (start, w) moves to neighbor index
    ``md5(salt:start:w:s) mod degree`` in the (sorted) adjacency —
    NO RNG state, so the same walks come out on any engine, any
    partitioning, any rerun (and a SQL oracle replays them). Walks
    stop early at sinks. Output: (start, walk, step, node) rows,
    step 0 = the start itself.

    ``weight`` switches to weight-proportional steps: the draw
    becomes the fixed-order cumsum pick over the ranked adjacency
    (first neighbor whose cumulative weight exceeds u·total,
    u = the same md5 draw / 2^52 — the :func:`node2vec_walks`
    mechanism), parallel edge weights sum, zero/negative drop. The
    unweighted draw expression is untouched, so the pinned oracle
    replays unchanged. The weighted step inspects every neighbor of
    each walker (a candidate join, deg(cur) rows per walker) where
    the unweighted step is a rank point-join — the inherent cost of
    weighted sampling without per-node alias tables.

    Scale shape: adjacency becomes a RANKED EDGE TABLE (node, rank,
    neighbor — one row_number window over edges), never per-node
    neighbor arrays (a hub's array would be degree-sized; the rank
    table stays row-shaped and co-partitions with the walk frontier).
    Each step is ONE join of the frontier against (degree, rank) on
    the current node — walk_len narrow joins total, frontier size
    ≤ nodes x n_walks throughout.

    r13: per-step checkpoints are LAZY (eager=False) and the loop has
    no per-step isEmpty barrier — the former eager-checkpoint +
    isEmpty pair cost 2 driver-BLOCKING round-trips per step (~10
    serialized launches for walk_len=5), each paying full scheduler
    latency before the next step's plan was even built. Lazily the
    checkpoints still truncate lineage at build time and materialize
    once each when the collecting action runs, but the driver never
    blocks between steps (measured isolated sf0.1, same machine
    state: random_walks 3.80 → 2.05 s, skipgram 3.98 → 2.55 s).
    A frontier that dies early now flows through the remaining steps
    as empty (narrow, zero-row) joins instead of breaking the loop —
    output-identical, since empty unions contribute nothing."""
    if walk_len < 1 or n_walks < 1:
        raise ValueError("walk_len and n_walks must be >= 1")
    if weight is None:
        e = (
            pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates()
            if directed
            else _sym(pairs, src, dst)
        ).withColumn("__w", F.lit(1.0))
    else:
        base = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("__w"),
        ).filter((F.col("__w") > 0) & (F.col("src") != F.col("dst")))
        if not directed:
            base = base.unionAll(
                base.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "__w"
                )
            )
        e = base.groupBy("src", "dst").agg(F.sum("__w").alias("__w"))
    rk = e.select(
        F.col("src").alias("cur"),
        F.col("dst").alias("nbr"),
        "__w",
        F.row_number()
        .over(Window.partitionBy("src").orderBy("dst"))
        .alias("rk"),
    ).localCheckpoint(eager=False)
    deg = rk.groupBy("cur").agg(F.max("rk").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    frontier = nodes.select(
        F.col("node").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("walk"),
        F.col("node").alias("node"),
    ).localCheckpoint(eager=False)
    out = frontier.select(
        "start", "walk", F.lit(0).cast("int").alias("step"), "node"
    )
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    for s in range(1, walk_len + 1):
        h = md5_prefix_long(
            F.concat(
                F.lit(salt + ":"),
                F.col("start").cast("string"),
                F.lit(":"),
                F.col("walk").cast("string"),
                F.lit(f":{s}"),
            ),
            52,
        )
        if weight is None:
            frontier = (
                frontier.withColumnRenamed("node", "cur")
                .join(deg, on="cur")  # sinks drop out: the walk ends
                .withColumn("rk", (h % F.col("deg") + 1).cast("int"))
                .join(rk, on=["cur", "rk"])
                .select("start", "walk", F.col("nbr").alias("node"))
                .localCheckpoint(eager=False)
            )
        else:
            cand = frontier.withColumnRenamed("node", "cur").join(
                rk, on="cur"
            )  # sinks drop out: the walk ends
            w_all = Window.partitionBy("start", "walk")
            wo = w_all.orderBy("rk")
            picked = (
                cand.withColumn("__cum", F.sum("__w").over(wo))
                # lagged cumsum as the lower bound — same boundary
                # rule as node2vec_walks
                .withColumn(
                    "__lo", F.coalesce(F.lag("__cum").over(wo), F.lit(0.0))
                )
                .withColumn("__tot", F.sum("__w").over(w_all))
                .withColumn("__u", h / F.lit(float(1 << 52)))
                .filter(
                    (F.col("__cum") > F.col("__u") * F.col("__tot"))
                    & (F.col("__lo") <= F.col("__u") * F.col("__tot"))
                )
            )
            frontier = picked.select(
                "start", "walk", F.col("nbr").alias("node")
            ).localCheckpoint(eager=False)
        out = out.unionAll(
            frontier.select(
                "start", "walk", F.lit(s).cast("int").alias("step"), "node"
            )
        )
    return out


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
    start: str = "start",
    walk: str = "walk",
    step: str = "step",
    node: str = "node",
) -> DataFrame:
    """(center, context, offset) skip-gram training pairs from a
    :func:`random_walks` frame — the DeepWalk/node2vec corpus step
    between walk sampling and embedding training. For every walk
    position, each neighbor within ``window`` steps (both directions)
    becomes a context row; offset is signed (context step − center
    step), so downstream distance weighting stays possible.

    Scale shape: NO self-join — one window sort per walk and
    ``window`` ``lead()`` taps; each lead-k pair is emitted in both
    directions by construction (the backward pair of (i, i+k) is
    (i+k, i)), so the output is exactly the skip-gram bag. Output
    mass is ≤ 2 * window * walk rows — linear in the corpus.
    Walks are deterministic, so the pairs replay in a SQL oracle."""
    if window < 1:
        raise ValueError("window must be >= 1")
    w = Window.partitionBy(start, walk).orderBy(F.col(step))
    taps = walks.select(
        F.col(start).alias("start"),
        F.col(walk).alias("walk"),
        F.col(node).alias("center"),
        *[
            F.lead(node, k).over(w).alias(f"__c{k}")
            for k in range(1, window + 1)
        ],
    )
    tapped = taps.select(
        "start",
        "walk",
        "center",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("off"),
                        F.col(f"__c{k}").alias("ctx"),
                    )
                    for k in range(1, window + 1)
                ]
            )
        ).alias("p"),
    ).filter(F.col("p.ctx").isNotNull())
    fwd = tapped.select(
        "start", "walk", "center",
        F.col("p.ctx").alias("context"),
        F.col("p.off").alias("offset"),
    )
    bwd = tapped.select(
        "start", "walk",
        F.col("p.ctx").alias("center"),
        F.col("center").alias("context"),
        (-F.col("p.off")).alias("offset"),
    )
    return fwd.unionAll(bwd)


def _ranked_local(
    nodes: DataFrame, col: str, n_partitions: int | None
) -> DataFrame:
    """The lazy ranking stage of :func:`ranked_vocabulary` — kept
    separate so tests can pin its executed plan (no SinglePartition
    exchange) before the checkpoint hides it."""
    spark = nodes.sparkSession
    if n_partitions is None:
        n_partitions = max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")), 1
        )
    return (
        nodes.repartitionByRange(n_partitions, F.col(col))
        .select(F.col(col), F.spark_partition_id().alias("__pid"))
        .withColumn(
            "__lrk",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(F.col(col))
            ),
        )
    )


def ranked_vocabulary(
    nodes: DataFrame, col: str = "__nn", out: str = "__rk",
    n_partitions: int | None = None, return_total: bool = False,
):
    """Dense global rank 1..n of a DISTINCT-valued column WITHOUT a
    single-partition sort — the scale-safe replacement for
    ``row_number().over(Window.orderBy(col))``, which Spark executes
    as ONE task holding every row (fatal on a billion-node
    vocabulary). Two passes instead:

    1. range-repartition by ``col`` (ordered, non-overlapping
       partitions), rank locally within each partition;
    2. per-partition row counts — a ``n_partitions``-row aggregate,
       collected driver-side (bounded by construction: one row per
       shuffle partition) — become cumulative offsets folded in as a
       literal map, so global rank = offset[pid] + local rank.

    Global ranks are partition-boundary-independent (ranges are
    ordered and disjoint), so the result equals the naive window
    bit-for-bit; the input is materialized (localCheckpoint) so the
    count pass and the output share one set of boundaries. The plan
    contains NO SinglePartition exchange (plan-pinned in
    tests/test_plan_shape.py). Input must be duplicate-free in
    ``col`` (ranks of ties would be partition-order-dependent)."""
    local = _ranked_local(nodes, col, n_partitions).localCheckpoint(
        eager=True
    )
    counts = {
        r["__pid"]: r["c"]
        for r in local.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # ``acc`` is the exact total row count — already on the driver
    # from the bounded per-partition count pass, so callers that need
    # |vocab| (return_total=True) get it WITHOUT another aggregation
    # job over the data (r13: negative_samples used to re-derive it
    # as a max-rank broadcast aggregate).
    if not offsets:
        empty = local.select(F.col(col), F.col("__lrk").alias(out))
        return (empty, 0) if return_total else empty
    omap = F.create_map(
        *[x for pid in sorted(offsets) for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    ranked = local.select(
        F.col(col),
        (F.element_at(omap, F.col("__pid")) + F.col("__lrk"))
        .cast("int")
        .alias(out),
    )
    return (ranked, acc) if return_total else ranked


def node2vec_walks(
    pairs: DataFrame,
    walk_len: int = 5,
    n_walks: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    src: str = "src",
    dst: str = "dst",
    salt: str = "n2v",
    directed: bool = True,
    weight: str | None = None,
) -> DataFrame:
    """Deterministic node2vec-biased walks (Grover & Leskovec 2016):
    like :func:`random_walks` but step s ≥ 2 weights each candidate
    x from cur by its relation to the PREVIOUS node — 1/``p`` for
    returning (x = prev), 1 for staying near (x adjacent to prev),
    1/``q`` for exploring outward. Low p ⇒ backtracking (BFS-like
    neighborhoods), low q ⇒ outward drift (DFS-like). Step 1 is
    uniform (no prev yet), exactly node2vec's convention.

    ``weight`` names an edge-weight column (the paper's weighted
    form: transition weight = w(cur, x) · bias). Parallel edge
    weights sum, zero/negative-weight edges drop — the family-wide
    convention. The weighted step 1 draws proportional to w via the
    same cumsum mechanism; the UNWEIGHTED step-1 draw stays the
    modular rank pick, so existing unweighted corpora (and the
    pinned twin/oracle) replay unchanged.

    Determinism contract: candidates keep the ranked-adjacency order;
    the draw is the first candidate whose cumulative weight exceeds
    u·total with u = md5(salt:start:walk:s)/2^52 — a fixed-order
    cumsum (exact dyadic bias weights; weighted form multiplies the
    input weights in the same fixed order), so walks replay
    bit-for-bit on any engine/partitioning (pinned against
    pure-python twins, weighted and unweighted).

    Scale shape: per step, ONE join of the frontier against the
    ranked edge table on the current node (candidate rows =
    Σ deg(cur) — the intrinsic node2vec cost of inspecting every
    candidate's relation to prev), one left semi-ish join against the
    edge set keyed (prev, candidate) for the adjacency class, and one
    per-(start,walk) window for the cumsum pick (partition size =
    deg(cur), never global). No per-node arrays, no alias tables.
    Per-step checkpoints are lazy with no isEmpty barrier (r13) —
    see :func:`random_walks` for the rationale; one collecting job
    instead of 2·walk_len driver-blocking jobs, identical output."""
    if walk_len < 1 or n_walks < 1:
        raise ValueError("walk_len and n_walks must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    if weight is None:
        e = (
            pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates()
            if directed
            else _sym(pairs, src, dst)
        ).withColumn("__w", F.lit(1.0))
    else:
        base = pairs.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("__w"),
        ).filter((F.col("__w") > 0) & (F.col("src") != F.col("dst")))
        if not directed:
            base = base.unionAll(
                base.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "__w"
                )
            )
        e = base.groupBy("src", "dst").agg(F.sum("__w").alias("__w"))
    rk = e.select(
        F.col("src").alias("cur"),
        F.col("dst").alias("nbr"),
        "__w",
        F.row_number()
        .over(Window.partitionBy("src").orderBy("dst"))
        .alias("rk"),
    ).localCheckpoint(eager=False)
    deg = rk.groupBy("cur").agg(F.max("rk").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    start = nodes.select(
        F.col("node").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("walk"),
        F.col("node").alias("node"),
    ).localCheckpoint(eager=False)
    out = start.select(
        "start", "walk", F.lit(0).cast("int").alias("step"), "node"
    )

    def draw_hash(s: int) -> Column:
        return md5_prefix_long(
            F.concat(
                F.lit(salt + ":"),
                F.col("start").cast("string"),
                F.lit(":"),
                F.col("walk").cast("string"),
                F.lit(f":{s}"),
            ),
            52,
        )

    def _cumsum_pick(cand: DataFrame, s: int, wt_col: str) -> DataFrame:
        """First candidate (ranked-adjacency order) whose cumulative
        weight exceeds u·total. The lower bound is the LAGGED cumsum
        (bit-identical floats), never cum - wt re-derived (a float
        round there could pick zero or two candidates at a boundary)."""
        w = Window.partitionBy("start", "walk")
        wo = w.orderBy("rk")
        u = (draw_hash(s) / F.lit(float(1 << 52))).alias("__u")
        return (
            cand.withColumn("__cum", F.sum(wt_col).over(wo))
            .withColumn(
                "__lo", F.coalesce(F.lag("__cum").over(wo), F.lit(0.0))
            )
            .withColumn("__tot", F.sum(wt_col).over(w))
            .withColumn("__u", u)
            .filter(
                (F.col("__cum") > F.col("__u") * F.col("__tot"))
                & (F.col("__lo") <= F.col("__u") * F.col("__tot"))
            )
        )

    # step 1: no prev yet — uniform modular rank pick (unweighted;
    # the pinned twin/oracle contract) or w-proportional cumsum
    step1 = start.withColumnRenamed("node", "cur")
    if weight is None:
        step1 = (
            step1.join(deg, on="cur")
            .withColumn("rk", (draw_hash(1) % F.col("deg") + 1).cast("int"))
            .join(rk, on=["cur", "rk"])
        )
    else:
        step1 = _cumsum_pick(step1.join(rk, on="cur"), 1, "__w")
    frontier = step1.select(
        "start", "walk", F.col("cur").alias("prev"),
        F.col("nbr").alias("node"),
    ).localCheckpoint(eager=False)
    out = out.unionAll(
        frontier.select(
            "start", "walk", F.lit(1).cast("int").alias("step"), "node"
        )
    )
    prev_adj = rk.select(
        F.col("cur").alias("prev"), F.col("nbr").alias("nbr"),
        F.lit(1).alias("__adj"),
    )
    for s in range(2, walk_len + 1):
        cand = frontier.withColumnRenamed("node", "cur").join(
            rk, on="cur"
        )  # sinks drop out: the walk ends
        bias = (
            F.when(F.col("nbr") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("__adj").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        cand = cand.join(prev_adj, on=["prev", "nbr"], how="left").withColumn(
            # unweighted: __w is literal 1.0, so __wt == bias bitwise
            # (IEEE 1.0·x is exact) and the pinned draws replay
            "__wt",
            F.col("__w") * bias,
        )
        picked = _cumsum_pick(cand, s, "__wt")
        frontier = picked.select(
            "start", "walk", F.col("cur").alias("prev"),
            F.col("nbr").alias("node"),
        ).localCheckpoint(eager=False)
        out = out.unionAll(
            frontier.select(
                "start", "walk", F.lit(s).cast("int").alias("step"), "node"
            )
        )
    return out


def negative_samples(
    pairs: DataFrame,
    k: int = 5,
    salt: str = "neg",
    center: str = "center",
    context: str = "context",
    hash_cols: list | None = None,
) -> DataFrame:
    """``k`` deterministic uniform negative nodes per skip-gram pair
    row — the word2vec/node2vec negative-sampling step. Draw i of a
    row is the node at rank ``md5(salt:<hash_cols>:i) mod n`` in the
    sorted distinct-node table (nodes = everything appearing as
    center or context), so the corpus replays bit-for-bit in any
    engine — no RNG state, stable under repartitioning. Accidental
    collisions with the row's own center/context are filtered (the
    word2vec convention), so a row may carry fewer than ``k``
    negatives (probability ~2k/n).

    ``hash_cols`` (default: every column of ``pairs``) feeds the
    draw hash — include walk/occurrence ids so repeated (center,
    context) bag entries draw independent negatives.

    Scale shape: the node table is ranked by
    :func:`ranked_vocabulary` — range-partitioned two-pass ranking,
    NO single-partition sort, no driver-side vocab (only the
    per-partition count vector is collected, bounded by the shuffle
    partition count); pairs explode x k and take ONE equi-join
    against it on the drawn rank — never a range join. Output:
    pairs' columns + (neg_i, negative)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    clash = {"neg_i", "negative", "__rk", "__n", "__nn"} & set(pairs.columns)
    if clash:
        raise ValueError(f"pairs already has reserved column(s): {sorted(clash)}")
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    hash_cols = list(hash_cols) if hash_cols is not None else list(pairs.columns)
    # two consumers read `pairs` (the vocab scan and the exploded draw
    # frame); without a checkpoint the whole upstream pipeline — for
    # the walks corpus, the skip-gram window over the walk joins —
    # computes twice (r13; lazy: materializes once on first use,
    # no extra job)
    pairs = pairs.localCheckpoint(eager=False)
    nodes = (
        pairs.select(F.col(center).alias("__nn"))
        .unionAll(pairs.select(F.col(context).alias("__nn")))
        .dropDuplicates()
    )
    ranked, n_vocab = ranked_vocabulary(
        nodes, col="__nn", out="__rk", return_total=True
    )
    # |vocab| comes free with the ranking's bounded count pass — as a
    # plan literal it replaces the old max-rank broadcast aggregate
    # (same integer by construction: ranks are dense 1..n), deleting a
    # crossJoin subtree and its broadcast-build job (r13, guide §2.4).
    key = F.concat_ws(
        ":", F.lit(salt), *[F.col(c).cast("string") for c in hash_cols]
    )
    ex = pairs.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_i")
    ).withColumn(
        "__rk",
        (
            md5_prefix_long(
                F.concat(key, F.lit(":"), F.col("neg_i").cast("string")),
                52,
            )
            % F.lit(n_vocab)
            + F.lit(1)
        ).cast("int"),
    )
    # The draw join: without a hint the planner size-estimates the
    # ranked vocab from its checkpoint and picks a sort-merge join —
    # shuffling the WHOLE exploded corpus by the draw rank (guide §8's
    # anti-pattern: heavy rows moved by a key unrelated to any
    # downstream layout). The vocab's exact row count is in hand, so
    # broadcast it whenever it provably fits (~40 B/row, cap well
    # under the default 10 MB autoBroadcast threshold); a corpus-scale
    # vocabulary falls back to the sort-merge plan unchanged.
    if 0 < n_vocab <= _NEG_BROADCAST_MAX_VOCAB:
        ranked = F.broadcast(ranked)
    out = (
        ex.join(ranked, on="__rk")
        .withColumnRenamed("__nn", "negative")
        .drop("__rk")
    )
    return out.filter(
        (F.col("negative") != F.col(center))
        & (F.col("negative") != F.col(context))
    )


def neighborhood_function(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
    max_radius: int = 16,
    tier: str = "sketch",
    registers_log2: int = 6,
) -> list:
    """ANF / HyperANF neighborhood function (Palmer et al. 2002;
    Boldi-Vigna 2011): ``N(r)`` = the number of (node, reachable)
    pairs within ``r`` hops, for r = 0..convergence — the curve
    behind effective-diameter and connectivity profiling at scales
    where per-pair BFS is unthinkable. Returns ``[(radius,
    n_pairs)]`` rows (driver-side list: one float per radius, bounded
    by ``max_radius``); feed to :func:`effective_diameter`.

    Two tiers (the exact-verifier vs scale-path doctrine):

    - ``tier="exact"``: materializes per-node reachability balls as
      (node, member) pairs via the house semi-naive frontier loop —
      O(sum of ball sizes) state, the small-graph oracle tier
      (SQL-replayable; the driver entry uses it).
    - ``tier="sketch"`` (default, the 100 TB path): HyperANF — each
      node carries 2^registers_log2 HLL registers (the md5 hash
      contract: register index = low bits, rho = leading-zero rank of
      the rest, EXACT via base-2 string length, no float log); each
      round every node element-wise-maxes its out-neighbors'
      registers into its own — ONE edge join + one m-column max
      aggregate per round, state is V x m bytes, convergence when no
      register changes. N(r) comes from the standard HLL estimator
      (alpha_m m^2 / sum 2^-reg, linear-counting small-range
      correction) summed over nodes.

    Directed=True counts OUT-reachability balls; False symmetrizes.
    Registers are exact integers all the way — the sketch itself is
    bit-deterministic on any engine/partitioning; only the final
    per-radius float estimate carries summation-order noise (~1e-12
    relative)."""
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    if tier not in ("exact", "sketch"):
        raise ValueError("tier must be 'exact' or 'sketch'")
    if max_radius < 1:
        raise ValueError("max_radius must be >= 1")
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        if directed
        else _sym(pairs, src, dst)
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    if tier == "exact":
        # r13 pinned layout: the loop runs under _fixpoint_conf (AQE
        # off, size-derived partitions from the ball-state bound) with
        # the edge frame laid out by the join key ONCE; the per-round
        # checkpoint is LAZY and ONE count() both materializes it and
        # doubles as the termination probe (was: eager checkpoint +
        # isEmpty + count = 3 driver actions per round).
        n_nodes = nodes.count()
        with _fixpoint_conf(
            edges.sparkSession, n_nodes * (max_radius + 1)
        ) as n_parts:
            e_by_member = (
                edges.withColumnRenamed("src", "member")
                .repartition(n_parts, "member")
                .localCheckpoint(eager=True)
            )
            state = nodes.select("node", F.col("node").alias("member"))
            state = state.localCheckpoint(eager=True)
            out = [(0, float(n_nodes))]
            frontier = state
            for r in range(1, max_radius + 1):
                grown = (
                    frontier.join(e_by_member, on="member")
                    .select("node", F.col("dst").alias("member"))
                    .dropDuplicates()
                    .join(state, on=["node", "member"], how="leftanti")
                    .localCheckpoint(eager=False)
                )
                n_grown = grown.count()
                if n_grown == 0:
                    break
                state = state.unionAll(grown)
                frontier = grown
                out.append((r, out[-1][1] + float(n_grown)))
            return out

    b = int(registers_log2)
    if not 4 <= b <= 12:
        raise ValueError("registers_log2 must be in [4, 12]")
    m = 1 << b
    # init: one hashed element (the node itself) per register set.
    # h = 52-bit md5; idx = h mod m, w = h div m (52-b bits);
    # rho = (52-b) - bitlen(w) + 1, exact via conv(w, 10, 2) length
    h = md5_prefix_long(F.col("node").cast("string"), 52)
    w = F.floor(h / m).cast("long")
    rho = F.when(
        w == 0, F.lit(52 - b + 1)
    ).otherwise(F.lit(52 - b) - F.length(F.conv(w, 10, 2)) + 1)
    idx = (h % m).cast("int")
    regs = nodes.select(
        "node",
        F.array(
            *[
                F.when(idx == i, rho).otherwise(F.lit(0)).cast("int")
                for i in range(m)
            ]
        ).alias("regs"),
    ).localCheckpoint(eager=True)

    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    est = F.aggregate(
        "regs", F.lit(0.0), lambda acc, x: acc + F.pow(2.0, -x)
    )
    zeros = F.size(F.filter("regs", lambda x: x == 0))
    raw = F.lit(alpha * m * m) / est
    # linear counting below the standard 2.5m threshold
    node_est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)

    def total(rf: DataFrame) -> float:
        return float(
            rf.agg(F.sum(node_est).alias("t")).first()["t"] or 0.0
        )

    # r13 pinned layout (same discipline as the exact tier): AQE off
    # for the loop, edge frame laid out by dst once, per-round
    # checkpoints lazy (the changed-probe materializes them). The
    # register math is expression-identical.
    with _fixpoint_conf(edges.sparkSession, nodes.count()) as n_parts:
        edges = edges.repartition(n_parts, "dst").localCheckpoint(
            eager=True
        )
        out = [(0, total(regs))]
        for r in range(1, max_radius + 1):
            contrib = (
                edges.join(
                    regs.select(F.col("node").alias("dst"), "regs"),
                    on="dst",
                )
                .groupBy(F.col("src").alias("node"))
                .agg(
                    *[
                        F.max(F.col("regs")[i]).alias(f"__r{i}")
                        for i in range(m)
                    ]
                )
            )
            new = (
                regs.join(contrib, on="node", how="left")
                .select(
                    "node",
                    F.array(
                        *[
                            F.greatest(
                                F.col("regs")[i],
                                F.coalesce(F.col(f"__r{i}"), F.lit(0)),
                            )
                            for i in range(m)
                        ]
                    ).alias("regs"),
                )
                .localCheckpoint(eager=False)
            )
            changed = (
                new.join(regs.withColumnRenamed("regs", "__old"), on="node")
                .filter(F.col("regs") != F.col("__old"))
                .isEmpty()
            )
            regs = new
            if changed:
                break
            out.append((r, total(regs)))
    return out


def effective_diameter(nf: list, fraction: float = 0.9) -> float:
    """Effective diameter from a :func:`neighborhood_function` curve:
    the (linearly interpolated) radius at which ``fraction`` of the
    final reachable-pair count is covered — the ANF convention. A
    single-radius curve (already converged at 0) returns 0.0."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    if not nf:
        raise ValueError("empty neighborhood function")
    target = fraction * nf[-1][1]
    prev_r, prev_n = nf[0]
    if prev_n >= target:
        return 0.0
    for r, n in nf[1:]:
        if n >= target:
            # interpolate within the step that crosses the target
            return prev_r + (target - prev_n) / (n - prev_n) * (r - prev_r)
        prev_r, prev_n = r, n
    return float(nf[-1][0])
