"""Serving table: the streaming drain's statuses must land in a keyed,
atomically-versioned table (the reference's ingestionStore as a table),
with idempotent micro-batch replay and point lookups."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.streaming.live import (
    live_priority_drain,
    requests_json_stream,
)
from data_ingestion_api_system_loop_ai_spark.streaming.serving import (
    ServingTable,
    attach_serving_sink,
)


def _write_requests(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _drain_to_serving(spark, tmp_path, suffix=""):
    req_dir = tmp_path / f"reqs{suffix}"
    req_dir.mkdir()
    low = {"request_id": "7", "priority": "LOW", "created_at_ms": 1000,
           "ids": [1, 2, 3, 4, 5, 6]}  # 2 batches
    high = {"request_id": "8", "priority": "HIGH", "created_at_ms": 2000,
            "ids": [10, 11]}  # 1 batch
    t0 = 1_700_000_000
    # one file per trigger (maxFilesPerTrigger=1): each trigger drains one
    # job; the third file re-delivers request 7 (skipped as duplicate) so a
    # third trigger exists to drain the last pending batch
    _write_requests(str(req_dir / "f1.json"), [low], t0)
    _write_requests(str(req_dir / "f2.json"), [high], t0 + 10)
    _write_requests(str(req_dir / "f3.json"), [low], t0 + 20)
    table = ServingTable(
        str(tmp_path / f"serving{suffix}"),
        key_cols=["batch_id"],
        seq_col="drain_seq",
    )
    schema = requests_json_stream(spark, str(req_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(req_dir))
    )
    q = attach_serving_sink(
        live_priority_drain(stream),
        table,
        checkpoint=str(tmp_path / f"ckpt{suffix}"),
    )
    q.awaitTermination()
    return table


def test_serving_table_holds_final_statuses(spark, tmp_path):
    table = _drain_to_serving(spark, tmp_path)
    cur = table.current(spark)
    assert cur is not None
    rows = {r["batch_id"]: r for r in cur.collect()}
    # 6 LOW ids -> 2 batches, 2 HIGH ids -> 1 batch; all drained/completed
    assert set(rows) == {"7-0", "7-1", "8-0"}
    assert all(r["status"] == "completed" for r in rows.values())
    # HIGH preempts: its batch drains before the LOW request's second
    assert rows["8-0"]["drain_seq"] < rows["7-1"]["drain_seq"]


def test_serving_upsert_replay_is_idempotent(spark, tmp_path):
    table = _drain_to_serving(spark, tmp_path, suffix="r")
    v_before = table.latest_version()
    cur_before = sorted(map(str, table.current(spark).collect()))
    # replay the full current table as if foreachBatch re-delivered it
    table.upsert(table.current(spark))
    assert table.latest_version() == v_before + 1
    assert sorted(map(str, table.current(spark).collect())) == cur_before


def test_serving_point_lookup_and_atomic_pointer(spark, tmp_path):
    table = _drain_to_serving(spark, tmp_path, suffix="l")
    got = table.lookup(spark, batch_id="8-0").collect()
    assert len(got) == 1 and got[0]["request_id"] == "8"
    # the pointer names a complete committed version with a manifest,
    # and every bucket directory the manifest references exists
    v = table.latest_version()
    manifest = table._manifest(v)
    assert manifest, "committed version must carry a manifest"
    for b, vb in manifest.items():
        bdir = table._bucket_dir(b, vb)
        assert os.path.isdir(bdir)
        assert any(f.endswith(".parquet") for f in os.listdir(bdir))
    # vacuum removes versions that are old AND unreferenced; whatever
    # remains is either inside the retention window or still referenced
    # by a retained manifest
    floor = v - table.keep_versions
    retained_refs = set()
    for rv in range(max(floor, 0), v + 1):
        m = table._manifest(rv)
        if m:
            retained_refs.update(m.values())
    for name in os.listdir(table.path):
        if name.startswith("v=") and not name.endswith(".claim"):
            ver = int(name[2:])
            assert ver >= floor or ver in retained_refs


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """VERDICT r02 #1: an upsert touching one key must rewrite <= 1
    bucket directory, with untouched buckets served from their prior
    version directories via the manifest."""
    table = ServingTable(
        str(tmp_path / "bucketed"),
        key_cols=["k"],
        seq_col="seq",
        num_buckets=8,
    )
    base = spark.createDataFrame(
        [(f"k{i}", 1, f"v{i}") for i in range(40)], "k string, seq int, val string"
    )
    table.upsert(base)
    v1 = table.latest_version()
    m1 = table._manifest(v1)
    one = spark.createDataFrame(
        [("k3", 2, "updated")], "k string, seq int, val string"
    )
    table.upsert(one)
    v2 = table.latest_version()
    # the new version directory holds exactly one rewritten bucket
    vdir = os.path.join(table.path, f"v={v2}")
    new_buckets = [d for d in os.listdir(vdir) if d.startswith("bucket=")]
    assert len(new_buckets) == 1
    # the manifest repoints only that bucket; all others still at v1
    m2 = table._manifest(v2)
    changed = {b for b in m2 if m2[b] != m1.get(b)}
    assert len(changed) == 1
    assert all(m2[b] == m1[b] for b in m1 if b not in changed)
    # merged state is correct: the updated key won, nothing lost
    rows = {r["k"]: (r["seq"], r["val"]) for r in table.current(spark).collect()}
    assert len(rows) == 40
    assert rows["k3"] == (2, "updated")
    assert rows["k7"] == (1, "v7")
    # full-key lookup reads one bucket and finds the updated row
    got = table.lookup(spark, k="k3").collect()
    assert len(got) == 1 and got[0]["val"] == "updated"
    # lookup for a key hashing to a possibly-absent bucket still works
    assert table.lookup(spark, k="nope").count() == 0


def test_crash_mid_commit_leaves_previous_version_live(spark, tmp_path):
    """The atomicity claim, exercised: a version directory written but
    never pointer-committed (a crash between the parquet write and the
    os.replace) must be invisible to readers, and the next successful
    upsert must supersede it cleanly."""
    import shutil

    table = ServingTable(
        str(tmp_path / "crash"), key_cols=["k"], seq_col="seq", num_buckets=4
    )
    base = spark.createDataFrame(
        [("a", 1, "v1"), ("b", 1, "v1")], "k string, seq int, val string"
    )
    table.upsert(base)
    v_ok = table.latest_version()
    rows_ok = sorted(map(str, table.current(spark).collect()))

    # simulate the crash: write v_ok+1 (directory + manifest) but no
    # pointer swap — copy the good version dir as a stand-in payload
    orphan = os.path.join(table.path, f"v={v_ok + 1}")
    shutil.copytree(os.path.join(table.path, f"v={v_ok}"), orphan)

    # readers still see the committed version only
    assert table.latest_version() == v_ok
    assert sorted(map(str, table.current(spark).collect())) == rows_ok

    # the next upsert claims the orphaned version number and commits over it
    table.upsert(
        spark.createDataFrame([("a", 2, "v2")], "k string, seq int, val string")
    )
    assert table.latest_version() == v_ok + 1
    rows = {r["k"]: r["val"] for r in table.current(spark).collect()}
    assert rows == {"a": "v2", "b": "v1"}


def test_status_served_from_store_matches_reference_body(spark, tmp_path):
    """GET /ingest/status/:id against the serving table: registration
    writes every batch as yet_to_start (seq 0), drain upserts win, and
    the body is the reference's exact shape — batches in index order,
    overall status by the reference rollup, exact 404 for unknown ids."""
    from data_ingestion_api_system_loop_ai_spark.streaming.live import (
        register_requests_sink,
        status_response_from_store,
    )

    req_dir = tmp_path / "reqs_store"
    req_dir.mkdir()
    low = {"request_id": "7", "priority": "LOW", "created_at_ms": 1000,
           "ids": [1, 2, 3, 4, 5, 6, 7]}  # 3 batches
    high = {"request_id": "8", "priority": "HIGH", "created_at_ms": 2000,
            "ids": [10, 11]}  # 1 batch
    t0 = 1_700_000_000
    _write_requests(str(req_dir / "f1.json"), [low], t0)
    _write_requests(str(req_dir / "f2.json"), [high], t0 + 10)
    table = ServingTable(
        str(tmp_path / "store"),
        key_cols=["batch_id"],
        seq_col="drain_seq",
        bucket_cols=["request_id"],  # status-store convention: O(bucket) reads
    )
    schema = requests_json_stream(spark, str(req_dir)).schema
    # registration pass: all 4 batches land as yet_to_start
    register_requests_sink(
        requests_json_stream(spark, str(req_dir)),
        table,
        checkpoint=str(tmp_path / "ckpt_reg"),
    ).awaitTermination()
    # drain pass: two triggers -> low-0 then high-0 completed
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(req_dir))
    )
    attach_serving_sink(
        live_priority_drain(stream),
        table,
        checkpoint=str(tmp_path / "ckpt_drain"),
    ).awaitTermination()

    body = json.loads(status_response_from_store(spark, table, "7"))
    assert list(body) == ["ingestion_id", "status", "batches"]
    assert body["ingestion_id"] == "7"
    assert body["status"] == "triggered"  # mixed completed/yet_to_start
    assert [b["status"] for b in body["batches"]] == [
        "completed", "yet_to_start", "yet_to_start",
    ]
    assert [b["ids"] for b in body["batches"]] == [[1, 2, 3], [4, 5, 6], [7]]
    assert [list(b) for b in body["batches"]] == [["batch_id", "ids", "status"]] * 3

    done = json.loads(status_response_from_store(spark, table, "8"))
    assert done["status"] == "completed"
    assert done["batches"] == [
        {"batch_id": "8-0", "ids": [10, 11], "status": "completed"}
    ]
    # exact reference 404 body
    assert (
        status_response_from_store(spark, table, "nope")
        == '{"error":"Ingestion ID not found."}'
    )
    # bucketing by request_id co-located all of request 7's batches:
    # its three rows share one bucket value in the on-disk layout
    from pyspark.sql import functions as F2

    n_buckets_req7 = (
        table.current(spark)
        .filter(F2.col("request_id") == "7")
        .select(F2.pmod(F2.hash("request_id"), F2.lit(table.num_buckets)))
        .distinct()
        .count()
    )
    assert n_buckets_req7 == 1
    # the placement config is pinned on disk: a reader opening the
    # table with only key/seq still prunes by request_id
    reopened = ServingTable(
        table.path, key_cols=["batch_id"], seq_col="drain_seq"
    )
    assert reopened.bucket_cols == ["request_id"]
    assert len(reopened.lookup(spark, request_id="8").collect()) == 1


def test_time_travel_read_of_retained_versions(spark, tmp_path):
    """current(version=v) resolves v's own manifest: after a second
    upsert overwrites a key, the old version still serves the old value
    while within the retention window."""
    t = ServingTable(
        str(tmp_path / "tt"), key_cols=["k"], seq_col="seq", num_buckets=4
    )
    v1 = t.upsert(spark.createDataFrame([(1, 10, "a")], "k long, seq long, val string"))
    v2 = t.upsert(spark.createDataFrame([(1, 20, "b")], "k long, seq long, val string"))
    assert [r["val"] for r in t.current(spark).collect()] == ["b"]
    assert [r["val"] for r in t.current(spark, version=v1).collect()] == ["a"]
    assert t.current(spark, version=v2).collect() == t.current(spark).collect()


def test_change_feed_between_versions(spark, tmp_path):
    """CDC read: per-key insert/update classification from the seq
    contract, unchanged keys absent (even when their bucket was
    rewritten), idempotent replay produces an empty feed, and a feed
    from before the first commit is all inserts."""
    schema = "k string, seq long, val string"
    t = ServingTable(
        str(tmp_path / "cf"), key_cols=["k"], seq_col="seq", num_buckets=8
    )
    v1 = t.upsert(spark.createDataFrame([("a", 1, "x"), ("b", 1, "y")], schema))
    v2 = t.upsert(spark.createDataFrame([("a", 2, "x2"), ("c", 1, "z")], schema))
    feed = {r["k"]: r for r in t.change_feed(spark, v1, v2).collect()}
    assert feed["a"]["change_type"] == "update"
    assert (feed["a"]["old_seq"], feed["a"]["new_seq"]) == (1, 2)
    assert feed["c"]["change_type"] == "insert" and feed["c"]["old_seq"] is None
    assert "b" not in feed
    # identical replay (same seq): no feed rows at all
    v3 = t.upsert(spark.createDataFrame([("a", 2, "x2")], schema))
    assert t.change_feed(spark, v2, v3).count() == 0
    # feed from "before the table existed" is the full state as inserts
    full = {r["k"]: r["change_type"] for r in t.change_feed(spark, -1, v3).collect()}
    assert full == {"a": "insert", "b": "insert", "c": "insert"}


def test_change_feed_raises_on_vacuumed_version(spark, tmp_path):
    """ADVICE r03: a NON-negative v_from whose manifest was vacuumed
    past retention must raise, not silently degrade to 'before the
    table existed' (which would report the entire v_to state as
    inserts — wrong CDC output with no error)."""
    schema = "k string, seq long, val string"
    t = ServingTable(
        str(tmp_path / "cfv"),
        key_cols=["k"],
        seq_col="seq",
        num_buckets=2,
        keep_versions=1,
    )
    v1 = t.upsert(spark.createDataFrame([("a", 1, "x")], schema))
    # upserts vacuum as they commit; enough of them push v1 (whose only
    # bucket is rewritten every version, so nothing keeps it referenced)
    # past the retention floor
    for i in range(2, 6):
        t.upsert(spark.createDataFrame([("a", i, f"x{i}")], schema))
    with pytest.raises(ValueError, match="outside retention"):
        t.change_feed(spark, v1)
    # the sentinel "before the table existed" still works
    assert t.change_feed(spark, -1).count() == 1


def test_rebucket_scales_layout_and_keeps_serving(spark, tmp_path):
    """Rebucketing rewrites the table under a new bucket count committed
    WITH the version (manifest envelope): point lookups and upserts
    route by the new hash space afterwards — including from a handle
    opened before the rebucket — and the change feed across the
    rebucket version is empty (same keys, same seqs, relocated)."""
    schema = "k string, seq long, val string"
    t = ServingTable(
        str(tmp_path / "rb"), key_cols=["k"], seq_col="seq", num_buckets=2
    )
    rows = [(f"k{i}", 1, f"v{i}") for i in range(20)]
    t.upsert(spark.createDataFrame(rows, schema))
    stale = ServingTable(str(tmp_path / "rb"), key_cols=["k"], seq_col="seq")
    v_before = t.latest_version()
    v_re = t.rebucket(spark, 8)
    assert v_re == v_before + 1 and t.num_buckets == 8
    # data intact, relocated: CDC across the rebucket sees no key change
    assert t.change_feed(spark, v_before, v_re).count() == 0
    # lookups route through the NEW hash space
    for key in ("k3", "k17"):
        got = t.lookup(spark, k=key).collect()
        assert len(got) == 1 and got[0]["val"] == "v" + key[1:]
    # a pre-rebucket handle adopts the committed count on its next op
    stale.upsert(spark.createDataFrame([("k3", 2, "v3b")], schema))
    assert stale.num_buckets == 8
    assert t.lookup(spark, k="k3").collect()[0]["val"] == "v3b"
    # a cold open reads the refreshed config default
    cold = ServingTable(str(tmp_path / "rb"), key_cols=["k"], seq_col="seq")
    assert cold.num_buckets == 8
    assert cold.lookup(spark, k="k17").collect()[0]["val"] == "v17"


def test_delete_tombstones_full_lifecycle(spark, tmp_path):
    """Row-level deletes as tombstone upserts: the key stops being
    served (current + point lookup), the change feed emits the
    liveness transition (delete, then insert on revival), replayed
    deletes are idempotent, a delete batch may omit value columns, and
    a tombstone survives a rebucket so a replayed lower-seq upsert
    cannot revive the key."""
    schema = "k string, seq long, val string"
    t = ServingTable(
        str(tmp_path / "del"), key_cols=["k"], seq_col="seq", num_buckets=4
    )
    v1 = t.upsert(
        spark.createDataFrame(
            [("a", 1, "x"), ("b", 1, "y"), ("c", 1, "z")], schema
        )
    )
    # delete b with only key+seq (value columns omitted)
    v2 = t.delete(spark.createDataFrame([("b", 2)], "k string, seq long"))
    assert sorted(
        r["k"] for r in t.current(spark).collect()
    ) == ["a", "c"]
    assert t.lookup(spark, k="b").count() == 0
    feed = {r["k"]: r["change_type"] for r in t.change_feed(spark, v1, v2).collect()}
    assert feed == {"b": "delete"}
    # raw time travel still shows the marker
    raw = t.current(spark, include_tombstones=True)
    assert raw.filter("k = 'b'").collect()[0]["ss_deleted"] is True
    # replayed delete: no change events at all
    v3 = t.delete(spark.createDataFrame([("b", 2)], "k string, seq long"))
    assert t.change_feed(spark, v2, v3).count() == 0
    # revival by a higher-seq upsert
    v4 = t.upsert(spark.createDataFrame([("b", 3, "y2")], schema))
    assert t.lookup(spark, k="b").collect()[0]["val"] == "y2"
    assert {r["k"]: r["change_type"] for r in t.change_feed(spark, v3, v4).collect()} == {
        "b": "insert"
    }
    # tombstone survives a rebucket: re-delete, rebucket, replay OLD upsert
    t.delete(spark.createDataFrame([("b", 4)], "k string, seq long"))
    t.rebucket(spark, 8)
    assert t.lookup(spark, k="b").count() == 0
    t.upsert(spark.createDataFrame([("b", 3, "y2")], schema))  # stale replay
    assert t.lookup(spark, k="b").count() == 0  # tombstone seq 4 still wins


def test_purge_tombstones_reclaims_below_replay_floor(spark, tmp_path):
    """Tombstones below the caller's replay floor are physically
    dropped (raw read no longer shows them; a fully-emptied bucket
    leaves the manifest); tombstones at/above the floor survive and
    keep holding their keys down."""
    schema = "k string, seq long, val string"
    t = ServingTable(
        str(tmp_path / "purge"), key_cols=["k"], seq_col="seq", num_buckets=4
    )
    t.upsert(spark.createDataFrame([("a", 1, "x"), ("b", 1, "y")], schema))
    t.delete(spark.createDataFrame([("a", 2), ("b", 5)], "k string, seq long"))
    v_before = t.latest_version()
    v = t.purge_tombstones(spark, min_seq=3)
    assert v == v_before + 1
    raw = t.current(spark, include_tombstones=True)
    marks = {r["k"]: r["ss_deleted"] for r in raw.collect()}
    assert "a" not in marks          # purged (seq 2 < floor 3)
    assert marks.get("b") is True    # survives (seq 5 >= floor)
    assert t.lookup(spark, k="b").count() == 0  # still held down
    # idempotent: nothing left below the floor -> no new version
    assert t.purge_tombstones(spark, min_seq=3) == v


def test_concurrent_write_claim_single_winner(spark, tmp_path):
    """Two writers racing on the same version: exactly one wins; the
    loser raises ConcurrentWriteConflict instead of silently clobbering
    the winner's directories, and retrying after a re-read succeeds.
    A crashed claimant is released by the manual break_claim."""
    import pytest as _pytest

    from data_ingestion_api_system_loop_ai_spark.streaming.serving import (
        ConcurrentWriteConflict,
    )

    schema = "k string, seq long, val string"
    store = str(tmp_path / "occ")
    a = ServingTable(store, key_cols=["k"], seq_col="seq", num_buckets=4)
    b = ServingTable(store, key_cols=["k"], seq_col="seq", num_buckets=4)
    a.upsert(spark.createDataFrame([("x", 1, "v1")], schema))
    # writer B claims the next version first (simulating the race)
    b._claim_version(a.latest_version() + 1)
    with _pytest.raises(ConcurrentWriteConflict):
        a.upsert(spark.createDataFrame([("x", 2, "v2")], schema))
    # winner's state is untouched by the failed writer
    assert a.lookup(spark, k="x").collect()[0]["val"] == "v1"
    # crashed claimant: operator releases the claim, retry wins
    a.break_claim(a.latest_version() + 1)
    a.upsert(spark.createDataFrame([("x", 2, "v2")], schema))
    assert a.lookup(spark, k="x").collect()[0]["val"] == "v2"


def test_wire_connector_drain_store_end_to_end(spark, tmp_path):
    """Capstone integration on engine components only: wire capture
    files -> ingestwire STREAM source -> registration + live priority
    drain -> bucketed serving store -> byte-exact reference status
    bodies. The throttled connector processes one capture file per
    availableNow run (the engine prefetches a single read() to define
    "available now"), so repeated runs against one checkpoint are the
    deterministic stand-in for processing-time ticks — and double as a
    resumption proof: every run picks up exactly where the last
    committed offset left off."""
    from data_ingestion_api_system_loop_ai_spark.sources.wire_source import (
        IngestWireDataSource,
    )
    from data_ingestion_api_system_loop_ai_spark.streaming.live import (
        register_requests_sink,
        status_response_from_store,
    )

    spark.dataSource.register(IngestWireDataSource)
    cap = tmp_path / "wire_cap_e2e"
    cap.mkdir()
    low = {"request_id": "7", "priority": "LOW", "created_at_ms": 1000,
           "ids": [1, 2, 3, 4, 5, 6, 7]}  # 3 batches
    high = {"request_id": "8", "priority": "HIGH", "created_at_ms": 2000,
            "ids": [10, 11]}  # 1 batch
    _write_requests(str(cap / "c1.jsonl"), [low], 1_700_000_000)
    _write_requests(str(cap / "c2.jsonl"), [high], 1_700_000_010)

    table = ServingTable(
        str(tmp_path / "wire_store"),
        key_cols=["batch_id"],
        seq_col="drain_seq",
        bucket_cols=["request_id"],
    )
    # registration: unthrottled, both capture files in one batch
    register_requests_sink(
        spark.readStream.format("ingestwire").load(str(cap)),
        table,
        checkpoint=str(tmp_path / "wire_ckpt_reg"),
    ).awaitTermination()
    assert sorted(
        r["batch_id"] for r in table.current(spark).collect()
    ) == ["7-0", "7-1", "7-2", "8-0"]

    def drain_tick():
        q = attach_serving_sink(
            live_priority_drain(
                spark.readStream.format("ingestwire")
                .option("maxFilesPerTrigger", "1")
                .load(str(cap))
            ),
            table,
            checkpoint=str(tmp_path / "wire_ckpt_drain"),
        )
        q.awaitTermination()

    drain_tick()  # tick 1: only LOW has arrived -> 7-0 drains
    body = json.loads(status_response_from_store(spark, table, "7"))
    assert list(body) == ["ingestion_id", "status", "batches"]
    assert body["status"] == "triggered"
    assert [b["status"] for b in body["batches"]] == [
        "completed", "yet_to_start", "yet_to_start"
    ]
    drain_tick()  # tick 2: HIGH arrives and preempts -> 8-0 drains
    done = json.loads(status_response_from_store(spark, table, "8"))
    assert done["status"] == "completed"
    assert [b["status"] for b in done["batches"]] == ["completed"]
    assert status_response_from_store(spark, table, "nope") == (
        '{"error":"Ingestion ID not found."}'
    )


def test_lookup_long_key_with_python_int_hits_right_bucket(spark, tmp_path):
    """Regression (round 9): Spark's hash() is type-sensitive —
    hash(INT 7012) != hash(BIGINT 7012) — so a pruned lookup passing a
    bare python int against a BIGINT key used to hash to the wrong
    bucket and silently return empty. The literal must be cast to the
    stored column type before bucketing."""
    from data_ingestion_api_system_loop_ai_spark.streaming.serving import (
        ServingTable,
    )

    t = ServingTable(
        str(tmp_path / "t"), key_cols=["k"], seq_col="seq", num_buckets=8
    )
    t.upsert(
        spark.createDataFrame(
            [(i, i * 10, 1) for i in range(50)], "k long, v long, seq long"
        )
    )
    for k in (0, 7, 13, 49):
        rows = t.lookup(spark, k=k).collect()
        assert len(rows) == 1 and rows[0]["v"] == k * 10, k
