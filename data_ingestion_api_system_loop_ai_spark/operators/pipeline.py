"""Tier-A pipeline operators (SURVEY.md section 2.1, A2-A11).

The reference implements a priority-scheduled, rate-limited, batched
ingestion pipeline as imperative JS (heap + setTimeout + in-place status
mutation). Here the *entire* pipeline is one deterministic, declarative
DataFrame program:

- requests are derived from the driver's test tables (FIXTURES.md:
  ``o_orderkey -> request_id``, ``o_orderpriority -> priority``,
  ``o_orderdate -> created_at``, the order's lineitem ``l_partkey``s -> ids);
- chunking (reference ``src/services/ingestService.js:171-179``) is a pure
  array expression — no shuffle at all;
- the min-heap drain (``src/utils/priorityQueue.js:25-92``) becomes a
  window ``row_number`` over (priority_rank, created_at, tie-breaks);
- the 5 s rate limiter (``ingestService.js:5,99-116``) has the closed form
  ``scheduled_start = t0 + (rn-1) * 5s`` — start-to-start spacing;
- per-id work time (``ingestService.js:45`` random 100-500 ms) is made
  deterministic as ``100 + id % 401`` ms so status at any ``as_of`` time is
  a pure CASE expression (``ingestService.js:78,89,133-134``);
- the overall-status rollup (``ingestService.js:15-35``) is a conditional
  aggregation.

Scale notes (100 TB): everything except the schedule's global
``row_number`` is embarrassingly parallel (narrow array ops, one hash
aggregation keyed by order). The global rank models an *inherently
serial* resource (one rate-limited queue), so a single ordered window is
semantically forced; at extreme request volumes the rank can be computed
in two phases (sort-partition counts -> prefix-sum offsets, i.e. the
zipWithIndex trick) without changing results. Batch status derivation is
per-row after that and fully parallel again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.ranking import global_row_number
from ..schemas import BATCH_SIZE, RATE_LIMIT_MS
from ..sources.loader import load_table

# Deterministic failure model for the reference's 'failed' batch status
# (``ingestService.js:89`` sets status = 'failed' when batch processing
# throws; ``README.md:66`` lists it): a batch fails iff it contains a
# poisoned id. The predicate replaces the reference's nondeterministic
# throw the same way ``100 + id % 401`` replaces its random latency.
FAILED_ID_MOD = 97
FAILED_ID_REM = 13


def _ids_str(col: str) -> Column:
    """Canonical '|'-joined string form of an id array (arrays are
    projected to strings in oracle-compared outputs so value hashing is
    representation-independent across engines)."""
    return F.array_join(F.transform(col, lambda x: x.cast("string")), "|")

# ---------------------------------------------------------------------------
# Shared builders (Spark side)
# ---------------------------------------------------------------------------


def requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the ``ingest_requests`` table from orders + lineitem.

    ``ids`` preserves lineitem order (l_linenumber) exactly the way the
    reference preserves input order within a request
    (``tests/api.test.js:131-133`` asserts chunk order). The groupBy is
    the only shuffle; it is keyed on the join key so the join that
    follows reuses the partitioning.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    ids = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
            lambda s: s["l_partkey"],
        ).alias("ids")
    )
    priority = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("HIGH"))
        .when(F.col("o_orderpriority") == "5-LOW", F.lit("LOW"))
        .otherwise(F.lit("MEDIUM"))
    )
    return orders.join(ids, orders.o_orderkey == ids.l_orderkey).select(
        F.col("o_orderkey").alias("request_key"),
        F.col("o_orderkey").cast("string").alias("request_id"),
        priority.alias("priority"),
        F.col("o_orderdate").alias("created_at"),
        F.col("ids"),
    )


def _priority_rank(col: Column) -> Column:
    # reference src/utils/priorityQueue.js:7 — {HIGH:1, MEDIUM:2, LOW:3}
    return (
        F.when(col == "HIGH", F.lit(1)).when(col == "MEDIUM", F.lit(2)).otherwise(F.lit(3))
    )


def batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk ids into consecutive batches of ``BATCH_SIZE`` preserving
    order — reference ``ingestService.js:171-179``. Pure array expression
    (``transform(sequence(...), i -> slice(ids, ...))``): shuffle-free,
    whole-stage-codegen'd, order-exact by construction."""
    req = requests(spark, sf_dir)
    n_batches = F.ceil(F.size("ids") / F.lit(BATCH_SIZE)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_batches - 1),
        lambda i: F.slice(F.col("ids"), i * BATCH_SIZE + 1, BATCH_SIZE),
    )
    return (
        req.filter(F.size("ids") > 0)
        .select(
            "request_key",
            "request_id",
            "priority",
            "created_at",
            F.posexplode(chunks).alias("batch_index", "batch_ids"),
        )
        .withColumn("batch_id", F.concat_ws("-", "request_id", "batch_index"))
        .withColumn("priority_rank", _priority_rank(F.col("priority")))
    )


# Parquet timestamps surface as TIMESTAMP_NTZ; all epoch arithmetic is done
# NTZ-native so results are independent of session/OS timezone.
_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form rate limiter (reference ``ingestService.js:5,99-116``):
    one batch starts per RATE_LIMIT_MS, start-to-start, in heap order
    (priority major, created_at then request/batch index tie-break —
    ``priorityQueue.js:12-23``). ``scheduled_start = t0 + (rn-1)*5s``.

    Deterministic per-id work time ``100 + id % 401`` ms replaces the
    reference's ``Math.random()*400+100`` (``ingestService.js:45``); ids in
    a batch run serially (``ingestService.js:70-77``) so batch work is the
    sum. ``as_of`` (the status-observation instant) is pinned mid-schedule
    so all three statuses appear.

    Scale plan: the heap's total order is computed with the two-phase
    ``global_row_number`` (range partition -> parallel local sort ->
    broadcast prefix offsets) and the whole-relation scalars (t0, batch
    count) with a 1-row broadcast aggregate — no single-partition
    window anywhere, so the schedule stays parallel at any row count.
    """
    b = batches(spark, sf_dir)
    work_ms = F.aggregate(
        "batch_ids",
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.lit(100) + x % 401,
    )
    ranked = global_row_number(
        b,
        bucket_keys=["priority_rank", "created_at"],
        order_keys=["request_key", "batch_index"],
        rn_col="rn",
    )
    stats = b.agg(
        F.min("created_at").alias("t0"), F.count("*").alias("total_batches")
    )
    return (
        ranked.crossJoin(F.broadcast(stats))
        .withColumn("t0_ms", F.expr(f"timestampdiff(MILLISECOND, {_EPOCH}, t0)"))
        .withColumn("work_ms", work_ms)
        .withColumn(
            "scheduled_start",
            F.expr(
                f"timestampadd(MILLISECOND, t0_ms + (rn - 1) * {RATE_LIMIT_MS}, {_EPOCH})"
            ),
        )
        .withColumn(
            "completed_at",
            F.expr("timestampadd(MILLISECOND, work_ms, scheduled_start)"),
        )
        .withColumn(
            "as_of",
            F.expr(
                f"timestampadd(MILLISECOND, t0_ms + (total_batches div 2) * {RATE_LIMIT_MS}, {_EPOCH})"
            ),
        )
        .withColumn(
            "status",
            F.when(F.col("as_of") < F.col("scheduled_start"), "yet_to_start")
            .when(F.col("as_of") < F.col("completed_at"), "triggered")
            .when(
                F.exists(
                    "batch_ids",
                    lambda x: x % FAILED_ID_MOD == FAILED_ID_REM,
                ),
                "failed",
            )
            .otherwise("completed"),
        )
    )


def _overall_status_agg() -> Column:
    """Status algebra of reference ``ingestService.js:15-35``: all
    yet_to_start -> yet_to_start; all completed -> completed; else
    triggered (empty case cannot occur post-chunking). A 'failed' batch
    falls into the else arm — the reference has no 'failed' rollup, so a
    request with any failed batch reports 'triggered' forever."""
    n = F.count("*")
    return (
        F.when(n == F.count(F.when(F.col("status") == "completed", 1)), "completed")
        .when(n == F.count(F.when(F.col("status") == "yet_to_start", 1)), "yet_to_start")
        .otherwise("triggered")
    )


# ---------------------------------------------------------------------------
# queries() entries — each takes (spark, sf_dir) and returns a DataFrame
# ---------------------------------------------------------------------------


def q_validate_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3 — validation (reference ``ingestController.js:10-15``:
    reject missing/empty ids and invalid priority, exact reference error
    strings) fused with case normalization (A3,
    ``ingestController.js:13,24``): mixed-case wire inputs are simulated
    on even request keys, ``priority`` is the upper-cased form when
    valid. One projection covers both reference code paths."""
    req = requests(spark, sf_dir)
    raw = F.when(F.col("request_key") % 2 == 0, F.lower("priority")).otherwise(
        F.col("priority")
    )
    base = req.select(
        "request_id", "ids", raw.alias("raw_priority"), "created_at"
    )
    bad = spark.sql(
        """
        SELECT * FROM VALUES
          ('bad-1', CAST(NULL AS ARRAY<BIGINT>), 'HIGH',   TIMESTAMP '2024-01-01'),
          ('bad-2', CAST(ARRAY() AS ARRAY<BIGINT>), 'HIGH', TIMESTAMP '2024-01-01'),
          ('bad-3', ARRAY(1L, 2L), CAST(NULL AS STRING),   TIMESTAMP '2024-01-01'),
          ('bad-4', ARRAY(1L, 2L), 'URGENT',               TIMESTAMP '2024-01-01')
        AS t(request_id, ids, raw_priority, created_at)
        """
    )
    ids_ok = F.col("ids").isNotNull() & (F.size("ids") > 0)
    prio_ok = F.upper(F.coalesce(F.col("raw_priority"), F.lit(""))).isin(
        "HIGH", "MEDIUM", "LOW"
    )
    return base.unionByName(bad).select(
        "request_id",
        "raw_priority",
        F.when(prio_ok, F.upper("raw_priority")).alias("priority"),
        (ids_ok & prio_ok).alias("is_valid"),
        F.when(
            ~ids_ok, F.lit("Invalid input: ids array is required and cannot be empty.")
        )
        .when(
            ~prio_ok,
            F.lit("Invalid input: priority is required and must be HIGH, MEDIUM, or LOW."),
        )
        .alias("error"),
    )


def q_assign_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — server-assigned identifiers (reference
    ``ingestController.js:17-18``: ``uuidv4()`` + ``new Date()``):
    ``uuid()`` + ``current_timestamp()`` projected over validated
    requests. Nondeterministic by nature — no oracle can ever hash it,
    so the round-9 rotation moved it to the unregistered surface
    (semantics pinned in tests/test_pipeline_semantics.py; the slot
    funds q_ccnet_buckets)."""
    req = requests(spark, sf_dir)
    return req.select(
        "request_id",
        F.expr("uuid()").alias("ingestion_id"),
        F.current_timestamp().alias("assigned_at"),
        F.size("ids").alias("n_ids"),
    )


def q_batch_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — fixed-size order-preserving chunking (BATCH_SIZE=3)."""
    return batches(spark, sf_dir).select(
        "request_id",
        "batch_index",
        "batch_id",
        _ids_str("batch_ids").alias("ids_str"),
        F.size("batch_ids").alias("n_ids"),
    )


def q_priority_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7 — total drain order of the min-heap (priority major,
    created_at/request/batch tie-break, ``priorityQueue.js:12-23``)
    together with the closed-form 1-batch-per-5s schedule it induces
    (``scheduled_start = t0 + (rn-1)*RATE_LIMIT_MS``,
    ``ingestService.js:5,99-116``)."""
    return schedule(spark, sf_dir).select(
        "rn", "batch_id", "priority", "priority_rank", "created_at", "scheduled_start"
    )


def q_process_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — per-id enrichment map: ``{id, data:'processed'}`` plus the
    deterministic latency model (reference ``ingestService.js:42-50``)."""
    return schedule(spark, sf_dir).select(
        "batch_id", F.explode("batch_ids").alias("id")
    ).select(
        "batch_id",
        "id",
        F.lit("processed").alias("data"),
        (F.lit(100) + F.col("id") % 401).alias("latency_ms"),
    )


def q_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — batch status at the pinned ``as_of`` instant: the full batch
    state machine yet_to_start -> triggered -> (completed | failed) as a
    CASE over the closed-form schedule; a finished batch is 'failed' iff
    it contains a poisoned id (reference ``ingestService.js:78,89``)."""
    return schedule(spark, sf_dir).select(
        "batch_id", "scheduled_start", "completed_at", "as_of", "status"
    )


def q_overall_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — request-level conditional rollup of batch statuses."""
    return (
        schedule(spark, sf_dir)
        .groupBy("request_id")
        .agg(
            _overall_status_agg().alias("status"),
            F.count("*").cast("long").alias("n_batches"),
        )
    )


def request_status(spark: SparkSession, sf_dir: str, request_id: str) -> DataFrame:
    """The ``GET /ingest/status/:id`` read path (reference
    ``ingestController.js:35-55``) for an arbitrary request id: batch
    projection + overall status; empty result = the 404 case."""
    sched = schedule(spark, sf_dir)
    per_req = W.partitionBy("request_id")
    n = F.count("*").over(per_req)
    overall = (
        F.when(
            n == F.count(F.when(F.col("status") == "completed", 1)).over(per_req),
            "completed",
        )
        .when(
            n
            == F.count(F.when(F.col("status") == "yet_to_start", 1)).over(per_req),
            "yet_to_start",
        )
        .otherwise("triggered")
    )
    return (
        sched.filter(F.col("request_id") == F.lit(request_id))
        .withColumn("overall_status", overall)
        .select(
            "request_id",
            "overall_status",
            "batch_id",
            _ids_str("batch_ids").alias("ids_str"),
            "status",
        )
    )


def status_response(spark: SparkSession, sf_dir: str, request_id: str) -> DataFrame:
    """A12 — the exact ``GET /ingest/status/:id`` 200 response document
    (reference ``ingestController.js:46-54``) as a one-row DataFrame of
    one JSON string, assembled ENGINE-side with ``to_json``:
    ``{"ingestion_id": ..., "status": ...,
    "batches": [{"batch_id": ..., "ids": [...], "status": ...}]}``
    with ids as real JSON arrays and batches in batch order. Empty
    result = the 404 case. ``to_json`` emits struct fields in
    declaration order, so the key order matches the reference byte
    layout."""
    sched = schedule(spark, sf_dir).filter(
        F.col("request_id") == F.lit(request_id)
    )
    batches_arr = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "batch_index",
                    F.struct(
                        "batch_id", F.col("batch_ids").alias("ids"), "status"
                    ).alias("b"),
                )
            )
        ),
        lambda s: s["b"],
    )
    rolled = sched.groupBy("request_id").agg(
        _overall_status_agg().alias("status"), batches_arr.alias("batches")
    )
    return rolled.select(
        F.to_json(
            F.struct(
                F.col("request_id").alias("ingestion_id"), "status", "batches"
            )
        ).alias("response")
    )


def ingest_responses(spark: SparkSession, path: str) -> DataFrame:
    """A1+A2+A4+A12 write path — ``POST /ingest`` over a JSON-lines file:
    fixed-schema parse (PERMISSIVE: malformed lines parse to NULL fields,
    exactly the shapes ``Array.isArray`` rejects), the reference's two
    validation checks in order (``ingestController.js:10-15``, exact 400
    bodies), server-assigned ``uuid()`` ingestion ids
    (``ingestController.js:17``), and the exact 202 body
    (``ingestController.js:32``) — all assembled engine-side with
    ``to_json`` (compact, key-ordered, byte-equal to Express
    ``res.json``). Returns (seq, http_status, body) in input order.

    CONTRACT: ``path`` must be a single JSON-lines file. ``seq`` is
    ``monotonically_increasing_id()``, which follows byte order within
    one file's scan but NOT across the files of a directory or glob
    (FilePartition packing orders splits by size, not name), so
    responses for multi-file input could interleave across files. The
    CLI (the only caller) passes one file; a directory-capable wire log
    would need an explicit per-file line offset (e.g.
    ``rdd.zipWithIndex`` keyed by ``input_file_name``) instead."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.monotonically_increasing_id().alias("seq"),
        F.from_json("value", "ids array<bigint>, priority string").alias("p"),
    )
    return _wire_responses(parsed)


def _wire_responses(parsed: DataFrame) -> DataFrame:
    """Shared ``POST /ingest`` response assembly over a relation of
    ``(seq, p struct<ids array<bigint>, priority string>)`` rows — the
    single source of truth for the validation order, the exact 400
    bodies, and the 202 body (used by the batch file path above and the
    live HTTP listener's per-request path, ``http_api.py``)."""
    ids_ok = F.col("p.ids").isNotNull() & (F.size("p.ids") > 0)
    prio_ok = F.upper(F.coalesce(F.col("p.priority"), F.lit(""))).isin(
        "HIGH", "MEDIUM", "LOW"
    )
    body = (
        F.when(
            ~ids_ok,
            F.to_json(
                F.struct(
                    F.lit(
                        "Invalid input: ids array is required and cannot be empty."
                    ).alias("error")
                )
            ),
        )
        .when(
            ~prio_ok,
            F.to_json(
                F.struct(
                    F.lit(
                        "Invalid input: priority is required and must be HIGH, MEDIUM, or LOW."
                    ).alias("error")
                )
            ),
        )
        .otherwise(F.to_json(F.struct(F.expr("uuid()").alias("ingestion_id"))))
    )
    return parsed.select(
        "seq",
        F.when(ids_ok & prio_ok, F.lit(202)).otherwise(F.lit(400)).alias("http_status"),
        body.alias("body"),
    )


def ingest_response_line(spark: SparkSession, line: str) -> tuple[int, str]:
    """One ``POST /ingest`` body -> (http_status, exact response body),
    through the engine's own parse/validate/uuid expressions — the
    live-listener form of ``ingest_responses`` (same columns, one
    row)."""
    return ingest_response_lines(spark, [line])[0]


def ingest_response_lines(
    spark: SparkSession, lines: list[str]
) -> list[tuple[int, str]]:
    """N concurrent ``POST /ingest`` bodies -> N (status, body) pairs
    in input order, through ONE engine job — the group-commit shape the
    listener's request batcher amortizes Spark job-launch latency with
    (VERDICT r04 #3): K concurrent POSTs cost one job of K rows, not K
    jobs of one row."""
    parsed = spark.createDataFrame(
        list(enumerate(lines)), "seq long, value string"
    ).select(
        "seq",
        F.from_json("value", "ids array<bigint>, priority string").alias("p"),
    )
    # input order restored driver-side: an engine orderBy on a K-row
    # relation would add a range-partitioner sampling job to every
    # batching window — measured at ~2x the whole job's latency
    rows = sorted(_wire_responses(parsed).collect(), key=lambda r: r["seq"])
    return [(int(r["http_status"]), r["body"]) for r in rows]


def q_status_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — point lookup of one request (min key, stable across sf) with
    batch projection + overall status (reference ``ingestController.js:35-55``)."""
    sched = schedule(spark, sf_dir)
    target = sched.groupBy().agg(F.min("request_key").alias("request_key"))
    per_req = W.partitionBy("request_id")
    n = F.count("*").over(per_req)
    overall = (
        F.when(
            n == F.count(F.when(F.col("status") == "completed", 1)).over(per_req),
            "completed",
        )
        .when(
            n == F.count(F.when(F.col("status") == "yet_to_start", 1)).over(per_req),
            "yet_to_start",
        )
        .otherwise("triggered")
    )
    return (
        sched.join(F.broadcast(target), "request_key")
        .withColumn("overall_status", overall)
        .select(
            "request_id",
            "overall_status",
            "batch_id",
            _ids_str("batch_ids").alias("ids_str"),
            "status",
        )
    )


def q_source_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — the JSON ingest source as a declarative parse (reference
    ``src/app.js:7`` ``express.json()`` + ``ingestRoutes.js:6``):
    requests serialized to the wire payload ``{"ids":[...],"priority":..}``
    and parsed back through ``from_json`` with the fixed ingest schema.
    Malformed payloads parse to NULL fields (PERMISSIVE) — the 400 path.
    In production this same schema+``from_json`` pair is the Kafka/file
    ``readStream`` deserializer (see ``streaming/live.py``)."""
    req = requests(spark, sf_dir)
    wire = req.select(
        "request_id", F.to_json(F.struct("ids", "priority")).alias("payload")
    )
    bad = spark.createDataFrame(
        [("bad-json-1", "{not json"), ("bad-json-2", '{"ids": "x"}')],
        "request_id string, payload string",
    )
    parsed = wire.unionByName(bad).select(
        "request_id",
        F.from_json("payload", "ids array<bigint>, priority string").alias("p"),
    )
    return parsed.select(
        "request_id",
        _ids_str("p.ids").alias("ids_str"),
        F.col("p.priority").alias("priority"),
        (F.col("p.ids").isNotNull() & F.col("p.priority").isNotNull()).alias(
            "parsed_ok"
        ),
    )


def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite flagship — validate -> chunk -> order -> schedule ->
    status -> per-request rollup, the whole reference pipeline as one
    deterministic DataFrame program (SURVEY.md section 2.1)."""
    return (
        schedule(spark, sf_dir)
        .groupBy("request_id", "priority", "created_at")
        .agg(
            F.count("*").cast("long").alias("n_batches"),
            F.min("scheduled_start").alias("first_start"),
            F.max("completed_at").alias("last_completed"),
            _overall_status_agg().alias("status"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (shared CTE prefix + per-query SELECTs)
# ---------------------------------------------------------------------------

PIPELINE_CTE = f"""
WITH ids_by_order AS (
  SELECT l_orderkey, list(l_partkey ORDER BY l_linenumber, l_partkey) AS ids
  FROM lineitem GROUP BY l_orderkey
),
requests AS (
  SELECT o_orderkey AS request_key,
         CAST(o_orderkey AS VARCHAR) AS request_id,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HIGH'
              WHEN o_orderpriority = '5-LOW' THEN 'LOW'
              ELSE 'MEDIUM' END AS priority,
         o_orderdate AS created_at,
         ids
  FROM orders JOIN ids_by_order ON o_orderkey = l_orderkey
),
batches_flat AS (
  SELECT request_key, request_id, priority, created_at, ids,
         unnest(range(0, CAST(ceil(len(ids) / 3.0) AS BIGINT))) AS bi
  FROM requests
),
batches AS (
  SELECT request_key, request_id, priority, created_at,
         CAST(bi AS INTEGER) AS batch_index,
         request_id || '-' || CAST(bi AS VARCHAR) AS batch_id,
         list_slice(ids, CAST(bi*3+1 AS BIGINT), CAST(bi*3+3 AS BIGINT)) AS batch_ids,
         CASE priority WHEN 'HIGH' THEN 1 WHEN 'MEDIUM' THEN 2 ELSE 3 END AS priority_rank
  FROM batches_flat
),
sched AS (
  SELECT *,
         row_number() OVER (ORDER BY priority_rank, created_at, request_key, batch_index) AS rn,
         epoch_ms(min(created_at) OVER ()) AS t0_ms,
         count(*) OVER () AS total_batches,
         CAST(list_aggregate(list_transform(batch_ids, x -> 100 + x % 401), 'sum') AS BIGINT) AS work_ms
  FROM batches
),
timed AS (
  SELECT *,
         make_timestamp((t0_ms + (rn-1)*5000) * 1000) AS scheduled_start,
         make_timestamp((t0_ms + (rn-1)*5000 + work_ms) * 1000) AS completed_at,
         make_timestamp((t0_ms + (total_batches // 2) * 5000) * 1000) AS as_of
  FROM sched
),
statused AS (
  SELECT *,
         CASE WHEN as_of < scheduled_start THEN 'yet_to_start'
              WHEN as_of < completed_at THEN 'triggered'
              WHEN len(list_filter(batch_ids, x -> x % {FAILED_ID_MOD} = {FAILED_ID_REM})) > 0 THEN 'failed'
              ELSE 'completed' END AS status
  FROM timed
)
"""

PIPELINE_ORACLES: dict[str, str] = {
    "q_validate_requests": PIPELINE_CTE
    + """
, with_invalid AS (
  SELECT request_id, ids,
         CASE WHEN request_key % 2 = 0 THEN lower(priority) ELSE priority END AS raw_priority
  FROM requests
  UNION ALL SELECT 'bad-1', CAST(NULL AS BIGINT[]), 'HIGH'
  UNION ALL SELECT 'bad-2', CAST([] AS BIGINT[]), 'HIGH'
  UNION ALL SELECT 'bad-3', [1, 2], CAST(NULL AS VARCHAR)
  UNION ALL SELECT 'bad-4', [1, 2], 'URGENT'
)
SELECT request_id, raw_priority,
       CASE WHEN upper(coalesce(raw_priority, '')) IN ('HIGH','MEDIUM','LOW')
            THEN upper(raw_priority) END AS priority,
       (ids IS NOT NULL AND len(ids) > 0
        AND upper(coalesce(raw_priority, '')) IN ('HIGH','MEDIUM','LOW')) AS is_valid,
       CASE WHEN ids IS NULL OR len(ids) = 0
              THEN 'Invalid input: ids array is required and cannot be empty.'
            WHEN raw_priority IS NULL OR upper(raw_priority) NOT IN ('HIGH','MEDIUM','LOW')
              THEN 'Invalid input: priority is required and must be HIGH, MEDIUM, or LOW.'
       END AS error
FROM with_invalid
""",
    "q_priority_order": PIPELINE_CTE
    + """
SELECT rn, batch_id, priority, priority_rank, created_at, scheduled_start FROM timed
""",
    "q_status_transitions": PIPELINE_CTE
    + """
SELECT batch_id, scheduled_start, completed_at, as_of, status FROM statused
""",
    "q_overall_status": PIPELINE_CTE
    + """
SELECT request_id,
       CASE WHEN count(*) = count(*) FILTER (WHERE status = 'completed') THEN 'completed'
            WHEN count(*) = count(*) FILTER (WHERE status = 'yet_to_start') THEN 'yet_to_start'
            ELSE 'triggered' END AS status,
       count(*) AS n_batches
FROM statused GROUP BY request_id
""",
    "q_status_lookup": PIPELINE_CTE
    + """
SELECT request_id,
       CASE WHEN count(*) OVER (PARTITION BY request_id)
              = count(CASE WHEN status = 'completed' THEN 1 END) OVER (PARTITION BY request_id)
              THEN 'completed'
            WHEN count(*) OVER (PARTITION BY request_id)
              = count(CASE WHEN status = 'yet_to_start' THEN 1 END) OVER (PARTITION BY request_id)
              THEN 'yet_to_start'
            ELSE 'triggered' END AS overall_status,
       batch_id,
       array_to_string(batch_ids, '|') AS ids_str,
       status
FROM statused
WHERE request_key = (SELECT min(request_key) FROM statused)
""",
    "q_source_ingest": PIPELINE_CTE
    + """
SELECT request_id, array_to_string(ids, '|') AS ids_str, priority, TRUE AS parsed_ok
FROM requests
UNION ALL SELECT 'bad-json-1', NULL, NULL, FALSE
UNION ALL SELECT 'bad-json-2', NULL, NULL, FALSE
""",
    "q_pipeline_e2e": PIPELINE_CTE
    + """
SELECT request_id, priority, created_at,
       count(*) AS n_batches,
       min(scheduled_start) AS first_start,
       max(completed_at) AS last_completed,
       CASE WHEN count(*) = count(*) FILTER (WHERE status = 'completed') THEN 'completed'
            WHEN count(*) = count(*) FILTER (WHERE status = 'yet_to_start') THEN 'yet_to_start'
            ELSE 'triggered' END AS status
FROM statused GROUP BY request_id, priority, created_at
""",
}

# Direct-test oracle for q_process_batch (evicted from the registry in
# the round-4 rotation; tests/test_unregistered_ops.py runs this
# comparison at driver grade).
PROCESS_BATCH_ORACLE = PIPELINE_CTE + """
SELECT batch_id, unnest(batch_ids) AS id, 'processed' AS data,
       100 + unnest(batch_ids) % 401 AS latency_ms
FROM batches
"""

# Direct-test oracle for q_batch_chunking (evicted in the late-round-5
# rotation — the chunk rule ceil(len/3) and batch composition stay
# hash-checked inside q_pipeline_e2e, whose n_batches/first_start/
# last_completed all derive from the batch relation; the slot funds
# q_kmv_overlap).
BATCH_CHUNKING_ORACLE = PIPELINE_CTE + """
SELECT request_id, batch_index, batch_id,
       array_to_string(batch_ids, '|') AS ids_str,
       CAST(len(batch_ids) AS INTEGER) AS n_ids
FROM batches
"""

UNREGISTERED_PIPELINE_QUERIES = {
    "q_batch_chunking": q_batch_chunking,
    # q_assign_ids gave up its registry slot in the round-9 rotation:
    # it is PERMANENTLY no_oracle (uuid()/current_timestamp() — the
    # reference's own nondeterminism, ingestController.js:17-18), so it
    # could never convert its slot into hash signal; the slot funds
    # q_ccnet_buckets (oracle-exact). Its semantics stay pinned by
    # test_assign_ids_semantics_pinned (tests/test_pipeline_semantics.py)
    # and its row count is implied by q_validate_requests (registered):
    # one output row per valid request.
    "q_assign_ids": q_assign_ids,
}
UNREGISTERED_PIPELINE_ORACLES = {"q_batch_chunking": BATCH_CHUNKING_ORACLE}

PIPELINE_QUERIES = {
    "q_validate_requests": q_validate_requests,
    # q_batch_chunking gave up its slot in the late-round-5 rotation
    # (chunk semantics stay hash-checked inside q_pipeline_e2e; the
    # slot funds q_kmv_overlap); driver-grade parity test kept.
    "q_priority_order": q_priority_order,
    # q_process_batch gave up its registry slot in the round-4 rotation
    # (its constant projection is hash-checked inside q_pipeline_e2e's
    # CTE every round); the slot funds q_dedup_spans. The function stays
    # API surface with the driver-grade parity test below.
    "q_status_transitions": q_status_transitions,
    "q_overall_status": q_overall_status,
    "q_status_lookup": q_status_lookup,
    "q_source_ingest": q_source_ingest,
    "q_pipeline_e2e": q_pipeline_e2e,
}
