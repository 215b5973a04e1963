"""Multi-pipeline manager: concurrent pipelines in one session, stop/resume
(ReplicatorManager start/stop/status analogue)."""

import os
import shutil
import time

import pytest

from openlogparse_spark.jobs.manager import PipelineManager
from openlogparse_spark.pipeline import PipelineConfig

TMP = "data/tmp/test_manager"


def _cfg(fx_dir, root, run_id, **kw):
    return PipelineConfig(
        input_path=os.path.join(fx_dir, "transcripts.parquet"),
        dims_dir=fx_dir, output_root=root, salt_buckets=4, run_id=run_id,
        **kw)


def test_concurrent_pipelines_independent_results(spark, fx_dir):
    shutil.rmtree(TMP, ignore_errors=True)
    mgr = PipelineManager(spark)
    f1 = mgr.start("p1", _cfg(fx_dir, os.path.join(TMP, "p1"), "p1"))
    f2 = mgr.start("p2", _cfg(fx_dir, os.path.join(TMP, "p2"), "p2",
                              input_filter="conv_id < 'conv00000100'"))
    with pytest.raises(ValueError):
        mgr.start("p1", _cfg(fx_dir, os.path.join(TMP, "px"), "px"))
    st = mgr.wait_all(timeout=600)
    assert st["p1"]["state"] == "done" and st["p2"]["state"] == "done"
    c1, c2 = f1.result().sink_counts, f2.result().sink_counts
    # the tenant-filtered pipeline routed strictly fewer rows, same routes
    assert set(c1) == set(c2)
    assert sum(c2.values()) < sum(c1.values())
    assert c2["r_txn"] > 0


def test_stop_cancels_then_resume_completes(spark, fx_dir):
    root = os.path.join(TMP, "victim")
    shutil.rmtree(root, ignore_errors=True)
    mgr = PipelineManager(spark)
    fut = mgr.start("victim", _cfg(fx_dir, root, "victim"))
    time.sleep(0.5)               # let the first jobs get in flight
    if not fut.done():
        mgr.stop("victim")
        with pytest.raises(Exception):
            fut.result(timeout=120)
        assert mgr.status()["victim"]["state"] == "failed"
    # restart under the same name + output root: manifest resume finishes
    # whatever the cancellation interrupted
    fut2 = mgr.start("victim", _cfg(fx_dir, root, "victim2"))
    res = fut2.result(timeout=600)
    assert res.sink_counts["r_txn"] > 0
    assert mgr.status()["victim"]["state"] == "done"


def test_http_front_start_status_stop(spark, fx_dir):
    """HTTP control plane (ReplicatorHttpServer.cpp:43-111 analogue):
    POST /start/{name} with config-merge over defaults, GET /status,
    409 on double-start, 404 on unknown stop."""
    import json as _json
    import urllib.request
    from urllib.error import HTTPError

    from openlogparse_spark.jobs.http_front import ManagerHttpServer

    root = os.path.join(TMP, "http")
    shutil.rmtree(root, ignore_errors=True)
    mgr = PipelineManager(spark)
    srv = ManagerHttpServer(
        mgr,
        defaults={"input_path": os.path.join(fx_dir, "transcripts.parquet"),
                  "dims_dir": fx_dir, "salt_buckets": 4, "run_id": "http"},
    ).start()
    base = f"http://{srv.host}:{srv.port}"

    def call(method, path, body=None):
        req = urllib.request.Request(
            base + path, method=method,
            data=_json.dumps(body).encode() if body is not None else None)
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, _json.loads(r.read())

    try:
        st, out = call("POST", "/start/h1", {"output_root": root})
        assert (st, out) == (200, {"started": "h1"})
        # double-start while running (or finished-restart, also legal) — the
        # running case must 409; poll status until done either way
        deadline = time.time() + 600
        while time.time() < deadline:
            st, status = call("GET", "/status")
            if status["h1"]["state"] != "running":
                break
            time.sleep(1)
        assert status["h1"]["state"] == "done"
        assert status["h1"]["sink_counts"]["r_txn"] > 0
        # unknown-name stop -> 404
        try:
            call("POST", "/stop/nope")
            raise AssertionError("expected 404")
        except HTTPError as e:
            assert e.code == 404
        # bad config -> 400
        try:
            call("POST", "/start/h2", {"no_such_field": 1})
            raise AssertionError("expected 400")
        except HTTPError as e:
            assert e.code == 400
    finally:
        srv.close()
