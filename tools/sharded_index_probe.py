"""Day-2 costs of a SHARDED-built ANN index (VERDICT r12 #5).

The from-index read/append scaling in SCALING.json (``q_knn_graph_read``
exponent 0.235, the append-path tests) was measured over FLAT-built
indexes <= 128 k; ``build_ann_index`` now ships shard-built edges past
32 k. This tool measures the day-2 surface over a sharded index at a
chosen n (default 256 k):

- ``build``: one ``build_ann_index`` (the sharded regime) — wall time;
- ``read``: ``q_knn_graph_budgeted_from_index`` (stored-edge top-k
  merge, plan-asserted embeddings-free), median of ``--reps`` noop
  writes;
- ``pagerank``: ``q_pagerank_from_index`` over the stored edges,
  median of ``--reps``;
- ``append``: one ``ingest_embedding_batch`` of ``--batch`` fresh
  jittered vectors (classification + the one-unit append of
  assignments/PQ codes/edges) — wall time, plus the verdict mix.

Writes ``sharded_index_day2`` rows into SCALING.json (merge
semantics), keyed by n. Regression bar (VERDICT r12 #5): read stays
sub-2 s, append stays O(batch·cell).

Usage: python tools/sharded_index_probe.py [--n 256000] [--reps 3]
       [--batch 1024] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from scaling_probe import JITTER, SEED, synth_dir  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    from data_ingestion_api_system_loop_ai_spark.operators import ann_index as ai
    from data_ingestion_api_system_loop_ai_spark.operators.pagerank import (
        q_pagerank_from_index,
    )
    from data_ingestion_api_system_loop_ai_spark.plans.lifecycle import (
        release_all_persistent,
    )
    from data_ingestion_api_system_loop_ai_spark.session import get_spark

    d = synth_dir(args.n)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sharded-index-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    ix = os.path.join(tempfile.mkdtemp(prefix="sharded_ix_"), "ix")
    t0 = time.monotonic()
    ai.build_ann_index(spark, d, ix)
    build_s = round(time.monotonic() - t0, 1)
    release_all_persistent(spark)
    cfg = ai.read_build_config(ix)
    print(f"build {build_s}s config={cfg}", flush=True)

    def median_of(fn) -> float:
        times = []
        for _ in range(args.reps):
            t = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t)
            release_all_persistent(spark)
        return round(sorted(times)[len(times) // 2], 3)

    read_s = median_of(
        lambda: ai.q_knn_graph_budgeted_from_index(spark, d, ix)
    )
    print(f"read median {read_s}s", flush=True)
    pr_s = median_of(lambda: q_pagerank_from_index(spark, d, ix))
    print(f"pagerank median {pr_s}s", flush=True)

    # fresh jittered batch: new ids above the corpus, vectors jittered
    # from the base corpus like synth_dir's own rows (same cluster
    # structure; a slice lands as near-dups of history, the rest kept)
    base = pq.read_table(os.path.join(d, "embeddings.parquet"))
    emb = np.array(
        base.column("embedding").to_pylist()[: args.batch], dtype=np.float64
    )
    rng = np.random.Generator(np.random.PCG64(SEED + 1))
    noise = rng.normal(0.0, JITTER, size=emb.shape)
    noise[: args.batch // 2] = 0.0  # half the batch: exact copies
    vecs = (emb + noise).astype(np.float32)
    bdir = os.path.join(os.path.dirname(ix), "batch.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(
                    range(args.n, args.n + len(vecs)), type=pa.int64()
                ),
                "embedding": pa.array(
                    [v for v in vecs.tolist()], type=pa.list_(pa.float32())
                ),
            }
        ),
        bdir,
    )
    new_vecs = spark.read.parquet(bdir)
    t0 = time.monotonic()
    verdicts = ai.ingest_embedding_batch(spark, new_vecs, ix).collect()
    append_s = round(time.monotonic() - t0, 1)
    mix = {}
    for r in verdicts:
        mix[r["status"]] = mix.get(r["status"], 0) + 1
    print(f"append {append_s}s mix={mix}", flush=True)

    entry = {
        "n": args.n,
        "batch": args.batch,
        "build_seconds": build_s,
        "build_config": cfg,
        "read_median_seconds": read_s,
        "pagerank_median_seconds": pr_s,
        "append_seconds": append_s,
        "append_mix": mix,
        "reps": args.reps,
        "harness": "noop_write",
    }
    print(json.dumps(entry), flush=True)
    result = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            result = json.load(f)
    result.setdefault("sharded_index_day2", {})[str(args.n)] = entry
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    shutil.rmtree(os.path.dirname(ix), ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
