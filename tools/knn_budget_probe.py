"""Recall audit for the scale-safe kNN build (VERDICT r09 #1).

``q_knn_graph_budgeted`` trades the multi-probe build's measured
~n^2.0 top octave (SCALING.json r9: 231 s at 128 k) for an
O(n·budget) seed + NN-Descent recovery. This tool MEASURES what that
trade costs in recall, instead of asserting it:

- synthesize n jittered vectors (the scaling probe's corpus — cluster
  structure preserved, copies off the exact-dup path);
- ground truth: exact top-k for a deterministic SAMPLE of queries
  (every ``n // n_sample``-th vec_id) by numpy cosine against the
  FULL corpus — sampled recall@k is the standard ANN metric and keeps
  the oracle O(sample · n) instead of O(n²);
- measure recall of (a) the bare budgeted seed, (b) the composed
  budgeted build (seed + NND_ITERS rounds), and — at sizes where the
  old build is still affordable — (c) the multi-probe ``q_knn_graph``
  for comparison;
- writes ``knn_graph_budgeted_recall`` into SCALING.json (merge
  semantics), where SURVEY §6 transcribes it.

Usage: python tools/knn_budget_probe.py [--n 32000] [--sample 500]
       [--with-multiprobe] [--out SCALING.json]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32000)
    ap.add_argument("--sample", type=int, default=500)
    ap.add_argument("--with-multiprobe", action="store_true")
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument(
        "--budget", type=int, default=None,
        help="override KNN_SEED_BUDGET — measures the budget-vs-recall "
             "trade at fixed n (the 'hold recall across octaves by "
             "growing the budget linearly' claim)",
    )
    ap.add_argument(
        "--nnd-iters", type=int, default=None,
        help="override NND_ITERS — measures whether an extra recovery "
             "round closes a recall gap the budget alone leaves",
    )
    ap.add_argument(
        "--probes", type=int, default=None,
        help="override KNN_SEED_PROBES — the octave-growth knob "
             "(VERDICT r10 #3): cell COVERAGE, not per-cell budget, is "
             "what recall saturates on past 32 k",
    )
    ap.add_argument(
        "--sharded", action="store_true",
        help="measure shardknn.knn_graph_sharded instead of the flat "
             "budgeted build (VERDICT r11 #1) — constant per-shard "
             "knobs; writes the knn_graph_sharded_recall family",
    )
    ap.add_argument(
        "--iters-local", type=int, default=None,
        help="(--sharded) override LOCAL_ITERS — within-shard NND "
             "rounds before the stitch",
    )
    ap.add_argument(
        "--iters-stitch", type=int, default=None,
        help="(--sharded) override STITCH_ITERS — NND rounds over the "
             "merged (shard graphs + stitch) graph",
    )
    ap.add_argument(
        "--stitch-budget", type=int, default=None,
        help="(--sharded) override the cross-shard global-cell pool cap",
    )
    ap.add_argument(
        "--stitch-probes", type=int, default=None,
        help="(--sharded) probed global cells per node in the stitch",
    )
    ap.add_argument(
        "--stitch-band", default=None, choices=("global", "seed"),
        help="(--sharded) stitch banding: per-node global cells "
             "(default) or the linear shard-cell-seed banding",
    )
    args = ap.parse_args()

    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        NND_ITERS,
        knn_graph_budgeted,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        KNN_BRIDGE_R,
        KNN_K,
        KNN_SEED_BUDGET,
        KNN_SEED_PROBES,
        ivf_assign,
        ivf_centroids,
        ivf_seeds,
        knn_graph,
        knn_graph_seed,
    )
    from data_ingestion_api_system_loop_ai_spark.session import get_spark
    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    d = synth_dir(args.n)

    # ---- exact ground truth for the sampled queries (numpy)
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
        order = np.lexsort((np.arange(n), -np.round(cos, 6)))
        truth[int(q)] = set(int(i) for i in order[:KNN_K])

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("knn-budget-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qset = {int(q) for q in qids}

    def sampled_recall(g) -> float:
        rows = g.filter(g.query_id.isin(list(qset))).collect()
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & truth[q]) for q in truth)
        return round(hits / (len(truth) * KNN_K), 4)

    budget = args.budget if args.budget is not None else KNN_SEED_BUDGET
    iters = args.nnd_iters if args.nnd_iters is not None else NND_ITERS
    probes = args.probes if args.probes is not None else KNN_SEED_PROBES

    e = load_table(spark, d, "embeddings")

    if args.sharded:
        from data_ingestion_api_system_loop_ai_spark.operators import (
            shardknn as sk,
        )

        il = args.iters_local if args.iters_local is not None else sk.LOCAL_ITERS
        ist = (
            args.iters_stitch
            if args.iters_stitch is not None
            else sk.STITCH_ITERS
        )
        sb = (
            args.stitch_budget
            if args.stitch_budget is not None
            else KNN_SEED_BUDGET
        )
        sp = args.stitch_probes if args.stitch_probes is not None else 1
        # the tool is the STANDALONE build (no prebuilt global assignment),
        # so the shipped default resolves to the linear seed banding
        band = args.stitch_band if args.stitch_band is not None else "seed"
        t0 = time.monotonic()
        g = sk.knn_graph_sharded(
            e, budget=budget, probes=probes, stitch_budget=sb,
            stitch_probes=sp, stitch_band=band, iters_local=il,
            iters_stitch=ist, n=n,
        ).localCheckpoint()
        secs = round(time.monotonic() - t0, 1)
        rec = sampled_recall(g)
        S = sk.n_shards_for(n)
        print(
            f"n={n} sharded S={S} b={budget} sb={sb} sp={sp} band={band} "
            f"il={il} is={ist} recall {rec} ({secs}s)", flush=True,
        )
        entry = {
            "n": args.n, "k": KNN_K, "shards": S, "budget": budget,
            "probes": probes, "stitch_budget": sb, "stitch_probes": sp,
            "stitch_band": band, "iters_local": il, "iters_stitch": ist,
            "sample": len(truth), "sharded_recall": rec,
            "total_seconds": secs,
        }
        key = str(args.n)
        for flag, val, default in (
            ("b", budget, KNN_SEED_BUDGET),
            ("sb", sb, KNN_SEED_BUDGET),
            ("sp", sp, 1),
            ("band", band, "seed"),
            ("il", il, sk.LOCAL_ITERS),
            ("is", ist, sk.STITCH_ITERS),
        ):
            if val != default:
                key += f"_{flag}{val}"
        result = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                result = json.load(f)
        result.setdefault("knn_graph_sharded_recall", {})[key] = entry
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(entry))
        return 0
    t0 = time.monotonic()
    seed = knn_graph_seed(
        ivf_assign(e), budget=budget, seeds=ivf_seeds(e), probes=probes
    ).localCheckpoint()
    seed_recall = sampled_recall(seed)
    print(f"n={n} b={budget} p={probes} seed recall {seed_recall}", flush=True)

    budgeted = knn_graph_budgeted(
        e, ivf_assign(e), budget=budget, iters=iters, probes=probes
    ).localCheckpoint()
    budgeted_secs = round(time.monotonic() - t0, 1)
    budgeted_recall = sampled_recall(budgeted)
    print(
        f"n={n} b={budget} p={probes} budgeted recall {budgeted_recall} "
        f"({budgeted_secs}s incl. seed)", flush=True,
    )

    entry = {
        "n": args.n,
        "k": KNN_K,
        "budget": budget,
        "probes": probes,
        "bridges": KNN_BRIDGE_R,
        "nnd_iters": iters,
        "sample": len(truth),
        "seed_recall": seed_recall,
        "budgeted_recall": budgeted_recall,
        "total_seconds": budgeted_secs,
    }
    if args.with_multiprobe:
        asg = ivf_assign(e)
        mp = knn_graph(e, ivf_centroids(asg), asg).localCheckpoint()
        entry["multiprobe_recall"] = sampled_recall(mp)
        print(f"n={n} multi-probe recall {entry['multiprobe_recall']}",
              flush=True)

    result = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            result = json.load(f)
    # keyed by n (default budget) or n_b{budget} (override) so several
    # sizes AND budget points accumulate without clobbering each other
    key = str(args.n)
    if args.budget is not None and args.budget != KNN_SEED_BUDGET:
        key += f"_b{budget}"
    if args.nnd_iters is not None and args.nnd_iters != NND_ITERS:
        key += f"_i{iters}"
    if args.probes is not None and args.probes != KNN_SEED_PROBES:
        key += f"_p{probes}"
    slot = result.setdefault("knn_graph_budgeted_recall", {})
    slot[key] = entry
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
