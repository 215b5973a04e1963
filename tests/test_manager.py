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
