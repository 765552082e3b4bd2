"""SparkSession factory.

Local test profile targets ``local[N]`` (single JVM); the same builder
settings are what we would ship as cluster defaults — AQE on (runtime
coalesce + skew-join handling), shuffle partitions sized to the
parallelism at hand, UTC session time so results are comparable against
the DuckDB oracle, and Arrow enabled for every pandas-UDF boundary.

At 100 TB these knobs change value but not shape: shuffle partitions
scale to ~2-3x total executor cores (or are left to AQE's
``coalescePartitions``), ``maxPartitionBytes`` stays at 128-256 MB so a
scan task fits comfortably in executor memory, and broadcast threshold
is raised only as far as driver memory allows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_ingestion_api_system_loop_ai_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to the core count — on a real cluster this would
    be ~2x total cores, but AQE coalescing makes the exact value soft.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing floor is BYTE-sized (default 1 MB): a
        # byte-tiny but CPU-heavy relation (pairwise cosines, hashed
        # n-gram featurize, shingle sets) gets coalesced onto 1-4
        # tasks, serializing the compute. A 64k floor keeps small
        # CPU-bound stages wide (measured: kNN graph -32%, CC clusters
        # -20% at sf0.1) while leaving >= 1 MB partitions — i.e. every
        # real-scale shuffle — exactly as before.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[32] runs driver + all executor threads in ONE JVM, so the
        # driver heap is the whole engine's heap: at 8g the wide-agg /
        # posting-list queries spend ~30-50% of wall time in GC (measured:
        # the dedup family ran 1.5-2x slower inside a 35-query bench
        # cycle than isolated). 24g on the 128 GiB test box removes that;
        # on a real cluster this would be executor memory instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # AQE can only COALESCE reducer partitions, never split them (the
    # skew-join splitter covers joins only): with shuffle.partitions ==
    # core count, per-partition bytes of every wide relation GROW with
    # the corpus until tasks spill (the r13 512 k sharded-build
    # diagnosis — see SURVEY §6). initialPartitionNum gives AQE a
    # higher starting point to coalesce DOWN from, so small stages stay
    # cheap (the 64k floor above still applies) while big shuffles get
    # bounded per-task memory. Env-tunable for scale probes; unset
    # keeps the session exactly as before.
    ip = os.environ.get("SPARK_GRAFT_INITIAL_PARTS")
    if ip:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", ip
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
