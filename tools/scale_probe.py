"""sf1 scale probe (VERDICT r4 #8): build a 10x copy of the sf0.1
synthetic tables by deterministic key-shifted replication, then time
a headline query family an order of magnitude above bench's scale —
evidence that the "single shuffle" / "cost ~ rounds x overhead"
claims hold at 10x.

The replication shifts every key column by ``i * 10_000_000`` per
copy i (copies are disjoint in key space; region/nation dimension
tables stay shared, so FK edges remain valid and the containment
graph keeps its 5 region components with 10x the membership).
Document texts get a per-copy suffix so the corpus is near-dup-rich
across copies (each doc gains 9 high-Jaccard twins) — deliberately
HARDER for MinHash verification than a same-size organic corpus.

Usage: python tools/scale_probe.py [out_dir] [query ...]
Writes parquet under out_dir (default spark-warehouse/sf1, gitignored)
and prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
N_COPIES = 10
OFF = 10_000_000

# key columns to shift, per table
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "lineitem_pricing_summary",
    "minhash_lsh_dedup",
    "connected_components_regions",
]


def build(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    for table, keys in SHIFTS.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        if not keys:  # shared dimension tables: single copy
            src.write.mode("overwrite").parquet(dst)
            continue
        copies = []
        for i in range(N_COPIES):
            c = src
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
            if table == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"built {table}: {n} rows", file=sys.stderr)


def main() -> None:
    import __spark_entry__ as E
    from pidb_rdf_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", "sf1",
    )
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("pidb-rdf-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, out_dir)

    qs = E.queries()
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    results = {}
    for name in names:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, out_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {"sec": round(best, 2), "rows": n}
        print(json.dumps({"query": name, **results[name]}))
    print(json.dumps({"sf": 1.0, "reps": reps, "results": results},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
