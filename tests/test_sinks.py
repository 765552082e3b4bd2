"""Sink layout guarantees: partitioned writes must prune, bucketed
tables must join without a shuffle — the two layout decisions that
dominate read cost at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table
from data_ingestion_api_system_loop_ai_spark.sources.sinks import (
    coalesced_for_write,
    write_bucketed_table,
    write_partitioned,
)


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(coalesced_for_write(o, 4), path, ["o_year"])

    back = spark.read.parquet(path)
    q = back.filter(F.col("o_year") == 1996)
    plan = _formatted_plan(q)
    # the year predicate must hit PartitionFilters (pruning), not PushedFilters
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_year" in pf_line
    expected = o.filter(F.col("o_year") == 1996).count()
    assert q.count() == expected


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    # managed tables land in the session's spark-warehouse dir and are
    # dropped (data included) in the finally block
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "t_orders_b", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed_table(l, "t_lineitem_b", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    try:
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        # force the non-broadcast path so bucketing is what kills the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            plan = _formatted_plan(j)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: no shuffle at all
        # and the join still computes the right thing
        n = j.count()
        expected = l.join(o, l.l_orderkey == o.o_orderkey).count()
        assert n == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_training_shards_bound_records_per_file(spark, sf_dir, tmp_path):
    """Every shard holds at most records_per_file rows, and the
    shuffle_key spreads one source's docs across shards."""
    import glob

    import pyarrow.parquet as pq

    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table
    from data_ingestion_api_system_loop_ai_spark.sources.sinks import (
        write_training_shards,
    )

    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(d, out, records_per_file=64, shuffle_key="doc_id")
    files = glob.glob(out + "/*.parquet")
    sizes = [pq.read_metadata(f).num_rows for f in files]
    assert sum(sizes) == d.count()
    assert max(sizes) <= 64
    # a single source's documents are spread across multiple shards
    src = d.groupBy("source").count().orderBy("count", ascending=False).first()["source"]
    hit = sum(
        1 for f in files
        if pq.read_table(f, columns=["source"]).column("source").to_pylist().count(src) > 0
    )
    assert hit > 1


def test_ingest_wire_data_source(spark, tmp_path):
    """The Spark 4 Python Data Source connector for the reference's
    ingest wire format: fixed schema (no inference), one input
    partition per capture file (per-file parallel read), rows equal to
    the native JSON reader, and malformed lines fail with file+line
    attribution instead of silent nulls."""
    import json as _json

    import pytest as _pytest

    from data_ingestion_api_system_loop_ai_spark.sources.wire_source import (
        WIRE_SCHEMA,
        IngestWireDataSource,
    )

    spark.dataSource.register(IngestWireDataSource)
    d = tmp_path / "wire"
    d.mkdir()
    rows = [
        {"request_id": "1", "priority": "LOW", "created_at_ms": 10, "ids": [1, 2]},
        {"request_id": "2", "priority": "HIGH", "created_at_ms": 20, "ids": [9]},
        {"request_id": "3", "priority": None, "created_at_ms": None, "ids": None},
    ]
    for i, r in enumerate(rows):
        with open(d / f"f{i}.jsonl", "w") as f:
            f.write(_json.dumps(r) + "\n")

    df = spark.read.format("ingestwire").load(str(d))
    assert df.rdd.getNumPartitions() == 3  # one partition per capture file
    got = {r["request_id"]: r.asDict() for r in df.collect()}
    want = {
        r["request_id"]: r.asDict()
        for r in spark.read.schema(WIRE_SCHEMA).json(str(d)).collect()
    }
    assert got == want and len(got) == 3

    with open(d / "bad.jsonl", "w") as f:
        f.write('{"request_id": "4", truncated\n')
    with _pytest.raises(Exception, match="bad.jsonl:1"):
        spark.read.format("ingestwire").load(str(d)).collect()


def test_ingest_wire_writer_round_trip_and_overwrite(spark, tmp_path):
    """The connector's write side: tasks land unique part files, commit
    publishes a _SUCCESS manifest naming exactly the committed files
    (reader honors it, so torn jobs are invisible), and overwrite mode
    replaces the previous job's data only after success."""
    import json as _json
    import os as _os

    from data_ingestion_api_system_loop_ai_spark.sources.wire_source import (
        IngestWireDataSource,
    )

    spark.dataSource.register(IngestWireDataSource)
    out = str(tmp_path / "wire_out")
    df1 = spark.createDataFrame(
        [("1", "LOW", 10, [1, 2]), ("2", "HIGH", 20, [9])],
        "request_id string, priority string, created_at_ms long, ids array<int>",
    )
    df1.write.format("ingestwire").mode("append").save(out)
    manifest = _json.load(open(_os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 2 and len(manifest["files"]) >= 1

    back = spark.read.format("ingestwire").load(out)
    assert {r["request_id"]: r.asDict() for r in back.collect()} == {
        r["request_id"]: r.asDict() for r in df1.collect()
    }

    # a stray file from a torn job is ignored because the manifest rules
    with open(_os.path.join(out, "part-torn.jsonl"), "w") as f:
        f.write('{"request_id":"99","priority":"LOW","created_at_ms":1,"ids":[]}\n')
    assert spark.read.format("ingestwire").load(out).count() == 2

    df2 = spark.createDataFrame(
        [("3", "MEDIUM", 30, [7])],
        "request_id string, priority string, created_at_ms long, ids array<int>",
    )
    df2.write.format("ingestwire").mode("overwrite").save(out)
    rows = spark.read.format("ingestwire").load(out).collect()
    assert [r["request_id"] for r in rows] == ["3"]


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """Format matrix: ORC round-trips lineitem exactly (Spark's
    built-in vectorized ORC reader/writer) and range predicates reach
    the ORC scan as pushed filters — the same pushdown guarantee the
    parquet tests pin."""
    from collections import Counter

    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    p = str(tmp_path / "li_orc")
    src.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert Counter(map(str, src.collect())) == Counter(map(str, back.collect()))

    filtered = back.filter(F.col("l_quantity") >= 25).select("l_orderkey")
    plan = filtered._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scan = plan[plan.index("Scan orc") :]
    assert "PushedFilters" in scan and "l_quantity" in scan.split("ReadSchema")[0]
    # column pruning: the ORC scan reads only the two referenced columns
    read_schema = scan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_quantity" in read_schema and "l_shipdate" not in read_schema
