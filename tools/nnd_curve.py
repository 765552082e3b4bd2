"""NN-Descent recall-vs-round convergence curve (VERDICT r08 #7).

The shipped ``q_nn_descent`` runs NND_ITERS=2 rounds; the r7/r8
evidence for that choice was a two-point measurement (recall 0.30 ->
0.46 at sf0.001, the adversarial random-vector case). This tool
records the WHOLE curve at a real size so the stopping rule is
measured, not asserted:

- synthesize n jittered vectors (the scaling probe's corpus — cluster
  structure preserved, copies off the exact-dup path);
- ground truth: exact top-k for a deterministic SAMPLE of queries
  (every ``n // n_sample``-th vec_id) by blocked numpy cosine against
  the FULL corpus — sampled recall@k is the standard ANN metric and
  keeps the oracle O(sample * n) instead of O(n^2);
- round 0 = the IVF multi-probe graph, rounds 1..R via the
  ``round_hook`` observer on ONE nn_descent run (no re-running
  earlier rounds);
- writes the curve + the plateau round under ``nn_descent_curve`` in
  SCALING.json (merge semantics), where SURVEY §6 transcribes it.

Stopping rule (documented in operators/nndescent.py): stop when the
round's recall gain is < CURVE_EPS (0.01 absolute) — the objective's
gain is the production-observable proxy (recall needs ground truth);
the curve shows both plateau together.

Usage: python tools/nnd_curve.py [--n 32000] [--rounds 6]
       [--sample 500] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))  # repo root (the package)
sys.path.insert(0, _TOOLS)                   # sibling tools

from scaling_probe import synth_dir  # noqa: E402

CURVE_EPS = 0.01


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32000)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--sample", type=int, default=500)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument(
        "--base",
        choices=("multiprobe", "budgeted-seed"),
        default="budgeted-seed",
        help="round-0 graph: the old IVF multi-probe build, or the "
        "two-probe budgeted seed the shipped q_knn_graph_budgeted "
        "refines (round 10)",
    )
    args = ap.parse_args()

    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        nn_descent,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        KNN_K,
        ivf_assign,
        ivf_centroids,
        ivf_seeds,
        knn_graph,
        knn_graph_seed,
    )
    from data_ingestion_api_system_loop_ai_spark.session import get_spark
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    d = synth_dir(args.n)

    # ---- exact ground truth for the sampled queries (numpy, blocked)
    tbl = pq.read_table(os.path.join(d, "embeddings.parquet"))
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    n = emb.shape[0]
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    stride = max(1, n // args.sample)
    qids = np.arange(0, n, stride)[: args.sample]
    truth: dict[int, set[int]] = {}
    for q in qids:
        cos = unit @ unit[q]
        cos[q] = -2.0  # exclude self, like the graph does
        # top-k by (cosine desc, id asc) — matches the engine tiebreak
        order = np.lexsort((np.arange(n), -np.round(cos, 6)))
        truth[int(q)] = set(int(i) for i in order[:KNN_K])

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("nnd-curve", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qset = {int(q) for q in qids}

    def sampled_recall(g) -> float:
        rows = g.filter(g.query_id.isin(list(qset))).collect()
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(
            len(got.get(q, set()) & truth[q]) for q in truth
        )
        return round(hits / (len(truth) * KNN_K), 4)

    e = load_table(spark, d, "embeddings")
    asg = ivf_assign(e)
    t0 = time.monotonic()
    if args.base == "multiprobe":
        base = knn_graph(e, ivf_centroids(asg), asg).localCheckpoint()
    else:
        base = knn_graph_seed(asg, seeds=ivf_seeds(e)).localCheckpoint()
    curve = [[0, sampled_recall(base)]]
    print(f"round 0 ({args.base}): recall {curve[0][1]}", flush=True)

    def hook(rnd: int, g) -> None:
        rec = sampled_recall(g)
        curve.append([rnd, rec])
        print(f"round {rnd}: recall {rec}", flush=True)

    _out, obj = nn_descent(e, base, iters=args.rounds, round_hook=hook)
    secs = round(time.monotonic() - t0, 1)

    plateau = next(
        (
            r
            for (r, rec), (_, prev) in zip(curve[1:], curve[:-1])
            if rec - prev < CURVE_EPS
        ),
        args.rounds,
    )
    entry = {
        "n": args.n,
        "k": KNN_K,
        "base": args.base,
        "sample": len(truth),
        "recall_by_round": curve,
        "objective_by_round": [round(o, 6) for o in obj],
        "plateau_round": plateau,
        "stopping_rule": f"stop when round recall gain < {CURVE_EPS} "
        "(objective gain is the production proxy)",
        "total_seconds": secs,
    }
    result = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            result = json.load(f)
    result["nn_descent_curve"] = entry
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
