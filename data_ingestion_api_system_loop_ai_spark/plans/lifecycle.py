"""Checkpoint lifecycle management for iterative loops.

``localCheckpoint`` is the engine's iterative-loop discipline (PageRank,
NN-Descent, k-means, CC, BPE): it truncates lineage so plan depth stays
O(1) across rounds. Its cost is a PERSISTED RDD per call that Spark
never drops on its own — the blocks survive until the session dies or
someone unpersists them. A single query leaks a few hundred MB at most,
but the engine's real sessions are LONG: the 118-query bench cycle and
the multi-size scaling probe each run dozens of checkpointing queries
back to back in one JVM, so the storage region fills with dead blocks
from queries that already finished, squeezing the unified-memory
execution region exactly when a later query needs it (measured round
10: the kNN-graph probe's later reps degraded 52 s -> 218 s at 128 k
with every block retained; with per-round release the spread collapsed).
On a real cluster the same leak evicts hot cached data fleet-wide.

``local_checkpoint_handle`` wraps ``df.localCheckpoint()`` and captures
which persistent RDD ids the call created, so the OWNER of an iterative
loop can release round r-1's blocks the moment round r is materialized
— the only point where an intermediate checkpoint is provably dead.

CAVEAT (why release must be owner-driven, never a blanket sweep): an
unpersisted localCheckpoint CANNOT be recomputed — the checkpoint
truncated its lineage, so a later access to a released block raises
"checkpoint block not found" instead of recomputing. Only release
checkpoints you created, and only after every downstream reader of
that round has materialized. A session-wide "unpersist everything"
(tempting in bench harnesses) would corrupt any live frozen-model or
cross-query DataFrame that still rides a checkpoint.

The id capture reads the session's persistent-RDD registry before and
after the checkpoint call; it assumes the DRIVER THREAD creating the
checkpoint is not racing other checkpoint-creating threads (true for
every engine loop — they are single-threaded driver loops; streaming
foreachBatch bodies run one batch at a time).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _persistent_ids(df: DataFrame) -> set[int]:
    sc = df.sparkSession.sparkContext._jsc.sc()
    ids: set[int] = set()
    it = sc.getPersistentRDDs().toList().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def local_checkpoint_handle(
    df: DataFrame, eager: bool = True
) -> tuple[DataFrame, Callable[[], None]]:
    """``df.localCheckpoint(eager)`` plus a ``release()`` closure that
    unpersists exactly the RDD blocks this checkpoint created.

    ``release`` is idempotent and asynchronous (non-blocking unpersist —
    the loop should not stall on block cleanup). Call it only once every
    reader of this round's data has materialized; the blocks cannot be
    recomputed afterward (see module docstring).
    """
    before = _persistent_ids(df)
    out = df.localCheckpoint(eager=eager)
    created = _persistent_ids(out) - before
    sc = out.sparkSession.sparkContext._jsc.sc()
    released = {"done": False}

    def release() -> None:
        if released["done"]:
            return
        released["done"] = True
        it = sc.getPersistentRDDs().toList().iterator()
        while it.hasNext():
            t = it.next()
            if t._1() in created:
                t._2().unpersist(False)

    return out, release


def release_all_persistent(spark) -> None:
    """Unpersist EVERY persistent RDD in the session — a harness-boundary
    sweep, not an operator tool.

    Legitimate ONLY between independent units of work in a measurement
    harness (bench.py's per-query loop, the scaling probe's reps) where
    the caller has verified that no cross-unit state rides a persisted
    RDD (both harnesses carry cross-query artifacts as parquet paths
    exclusively). Inside operators, use ``local_checkpoint_handle`` and
    release what you own — a blanket sweep there would corrupt any live
    checkpoint another query still reads (unrecoverable, see module
    docstring)."""
    it = (
        spark.sparkContext._jsc.sc().getPersistentRDDs().toList().iterator()
    )
    while it.hasNext():
        it.next()._2().unpersist(False)
