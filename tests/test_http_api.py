"""Live HTTP listener tests — `curl`-level parity with the reference's
Express surface (`src/app.js`, `src/routes/ingestRoutes.js`,
`src/controllers/ingestController.js`): exact bodies for 202/400/
200/404, the root liveness message, Express-style catch-all 404, and
(with the drain attached) statuses that progress on the trigger clock
while the HTTP thread only reads the serving table."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from data_ingestion_api_system_loop_ai_spark.http_api import (
    ERROR_BODY,
    ROOT_BODY,
    IngestApiServer,
)


def _req(port: int, method: str, path: str, body: dict | str | None = None):
    data = None
    if body is not None:
        data = (body if isinstance(body, str) else json.dumps(body)).encode()
    r = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    try:
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    srv = IngestApiServer(
        spark, root_dir=str(tmp_path_factory.mktemp("http_root")), port=0
    )
    srv.start_background()
    yield srv
    srv.shutdown()


def test_root_liveness_and_catchall_404(server):
    assert _req(server.port, "GET", "/") == (200, ROOT_BODY)
    code, body = _req(server.port, "GET", "/nope")
    assert (code, body) == (404, "Cannot GET /nope")
    code, body = _req(server.port, "POST", "/other", {})
    assert (code, body) == (404, "Cannot POST /other")


def test_post_validation_bodies_byte_exact(server):
    # ids missing / empty -> the first 400 body, verbatim
    for bad in ({"priority": "HIGH"}, {"ids": [], "priority": "HIGH"}, "not json"):
        code, body = _req(server.port, "POST", "/ingest", bad)
        assert code == 400
        assert body == json.dumps(
            {"error": "Invalid input: ids array is required and cannot be empty."},
            separators=(",", ":"),
        )
    # bad priority -> the second 400 body (validation order: ids first)
    code, body = _req(server.port, "POST", "/ingest", {"ids": [1], "priority": "x"})
    assert code == 400
    assert body == json.dumps(
        {
            "error": "Invalid input: priority is required and must be HIGH, MEDIUM, or LOW."
        },
        separators=(",", ":"),
    )


def test_post_then_status_roundtrip_byte_exact(server):
    code, body = _req(
        server.port, "POST", "/ingest", {"ids": [1, 2, 3, 4, 5], "priority": "HIGH"}
    )
    assert code == 202
    rid = json.loads(body)["ingestion_id"]
    assert body == json.dumps({"ingestion_id": rid}, separators=(",", ":"))

    code, body = _req(server.port, "GET", f"/ingest/status/{rid}")
    assert code == 200
    # the exact reference 200 document: key order, chunking of 5 ids
    # into [1,2,3]+[4,5], batch ids "<rid>-<index>", all yet_to_start
    assert body == json.dumps(
        {
            "ingestion_id": rid,
            "status": "yet_to_start",
            "batches": [
                {"batch_id": f"{rid}-0", "ids": [1, 2, 3], "status": "yet_to_start"},
                {"batch_id": f"{rid}-1", "ids": [4, 5], "status": "yet_to_start"},
            ],
        },
        separators=(",", ":"),
    )

    code, body = _req(server.port, "GET", "/ingest/status/does-not-exist")
    assert (code, body) == (
        404,
        json.dumps({"error": "Ingestion ID not found."}, separators=(",", ":")),
    )


def test_wire_log_published_atomically(server):
    """Accepted requests land as visible (non-dot) capture files — the
    streaming source's atomic-publish contract."""
    import os

    before = {f for f in os.listdir(server.wire_dir) if not f.startswith(".")}
    code, _ = _req(server.port, "POST", "/ingest", {"ids": [9], "priority": "LOW"})
    assert code == 202
    after = {f for f in os.listdir(server.wire_dir) if not f.startswith(".")}
    assert len(after - before) == 1
    new = (after - before).pop()
    rec = json.loads(open(os.path.join(server.wire_dir, new)).read())
    assert rec["ids"] == [9] and rec["priority"] == "LOW"


def test_error_middleware_500(server, monkeypatch):
    """A handler exception surfaces as the reference error middleware's
    exact 500 body, and the listener keeps serving afterwards."""
    monkeypatch.setattr(
        type(server),
        "get_status",
        lambda self, rid: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    code, body = _req(server.port, "GET", "/ingest/status/x")
    assert (code, body) == (500, ERROR_BODY)
    monkeypatch.undo()
    assert _req(server.port, "GET", "/")[0] == 200


def test_drain_progresses_statuses_on_the_trigger_clock(spark, tmp_path):
    """With the clock-paced drain attached, a POSTed request's batches
    leave yet_to_start and reach completed — observed purely over HTTP.
    The HTTP thread never computes transitions; the streaming query
    maintains the store (reference processQueue parity)."""
    srv = IngestApiServer(
        spark,
        root_dir=str(tmp_path / "root"),
        port=0,
        drain=True,
        drain_interval="1 seconds",
    )
    srv.start_background()
    try:
        code, body = _req(
            srv.port, "POST", "/ingest", {"ids": [1, 2, 3, 4], "priority": "HIGH"}
        )
        assert code == 202
        rid = json.loads(body)["ingestion_id"]
        seen = set()
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            _code, sbody = _req(srv.port, "GET", f"/ingest/status/{rid}")
            doc = json.loads(sbody)
            seen.add(doc["status"])
            if doc["status"] == "completed":
                assert [b["status"] for b in doc["batches"]] == [
                    "completed",
                    "completed",
                ]
                break
            time.sleep(0.5)
        assert "completed" in seen, f"statuses observed: {seen}"
        # both non-terminal rollups were servable along the way or the
        # drain outpaced polling — either way the terminal doc is exact
        assert seen <= {"yet_to_start", "triggered", "completed"}
    finally:
        srv.shutdown()
