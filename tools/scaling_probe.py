"""Scaling-exponent probe for the graph family (VERDICT r05 #4).

The four most expensive bench queries are the embedding-graph
operators (kNN build, CC clustering, NN-Descent). Their claimed cost
shapes are ~n^1.5 for the kNN cell join (sqrt(n)-cell IVF quantizer →
~2·n·sqrt(n) pair evaluations), kNN cost + O(diameter) label rounds
for CC, and ~n·k² per round for NN-Descent. This tool MEASURES the
growth instead of asserting it: it synthesizes embeddings tables at n,
4n, 16n under /tmp (testdata is read-only), runs each query at every
size, and fits the log-log slope.

Synthesis is deterministic (fixed numpy PCG64 seed): vector i is the
base vector i % n_base plus N(0, JITTER²) noise — jitter keeps copies
off the exact-duplicate path (which the cell cap would truncate) while
preserving the base corpus's cluster structure, so cell occupancy
scales realistically rather than degenerating into one dense cell.

Usage:  python tools/scaling_probe.py [--reps 3] [--out SCALING.json]
Writes one JSON file: per-query [n, median_sec] points + fitted
exponent; the SURVEY §6 table is transcribed from this output.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1/embeddings.parquet"
WORK = "/tmp/spark_graft_scaling"
SEED = 20260814
JITTER = 0.05


def synth_dir(n: int) -> str:
    """Materialize an sf-style dir with an n-row embeddings.parquet."""
    d = os.path.join(WORK, f"n{n}")
    out = os.path.join(d, "embeddings.parquet")
    if os.path.exists(out):
        return d
    os.makedirs(d, exist_ok=True)
    base = pq.read_table(BASE)
    emb = np.array(base.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(base.column("label").to_pylist())
    nb, dim = emb.shape
    rng = np.random.Generator(np.random.PCG64(SEED))
    reps = math.ceil(n / nb)
    tiled = np.tile(emb, (reps, 1))[:n]
    noise = rng.normal(0.0, JITTER, size=(n, dim))
    noise[:nb] = 0.0  # the first copy IS the base corpus
    vecs = (tiled + noise).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                np.tile(labels, reps)[:n].tolist(), type=pa.int32()
            ),
        }
    )
    pq.write_table(tbl, out)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--sizes", default="2000,8000,32000")
    ap.add_argument(
        "--queries",
        default="q_knn_graph,q_embedding_clusters,q_nn_descent",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_ingestion_api_system_loop_ai_spark.operators.components import (
        q_embedding_clusters,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        q_nn_descent,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        q_knn_graph,
    )
    from data_ingestion_api_system_loop_ai_spark.session import get_spark

    qfns = {
        "q_knn_graph": q_knn_graph,
        "q_embedding_clusters": q_embedding_clusters,
        "q_nn_descent": q_nn_descent,
    }
    names = [q.strip() for q in args.queries.split(",")]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scaling-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {n: synth_dir(n) for n in sizes}
    result: dict = {
        "seed": SEED,
        "jitter": JITTER,
        "reps": args.reps,
        "cpus": cpus,
        "queries": {},
    }
    for qname in names:
        fn = qfns[qname]
        points = []
        for n in sizes:
            times = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                cnt = fn(spark, dirs[n]).count()
                times.append(time.monotonic() - t0)
            med = sorted(times)[len(times) // 2]
            points.append([n, round(med, 3)])
            print(f"{qname} n={n}: median {med:.2f}s "
                  f"(min {min(times):.2f}) rows={cnt}", flush=True)
        # least-squares slope in log-log space (needs >= 2 sizes)
        slope = None
        if len(points) >= 2:
            xs = [math.log(p[0]) for p in points]
            ys = [math.log(p[1]) for p in points]
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            slope = round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                / sum((x - mx) ** 2 for x in xs),
                3,
            )
            print(f"{qname}: fitted exponent {slope}", flush=True)
        result["queries"][qname] = {"points": points, "exponent": slope}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
