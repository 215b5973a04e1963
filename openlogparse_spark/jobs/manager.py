"""Multi-pipeline manager: N concurrent pipelines in ONE Spark session.

The reference runs several replication pipelines in one process under a
manager with start/stop/status control (ReplicatorManager::main loop,
/root/reference/src/ReplicatorManager.cpp:222-269, driven by the HTTP
control plane ReplicatorHttpServer.cpp:43-111). Spark mapping: one
SparkSession, one manager thread per pipeline. Spark job-level controls are
thread-local, so each pipeline thread gets its own FAIR scheduler pool
(cluster time-slicing between pipelines instead of FIFO head-of-line
blocking) and its own job group (the stop handle — cancelJobGroup aborts
that pipeline's running jobs without touching the others).

Stopping is cooperative-at-stage-boundaries exactly like the reference's
shutdown flag: in-flight Spark jobs die immediately; the pipeline surfaces
the cancellation as a failed run. Because every stage is manifest-resumable,
a stopped pipeline restarted with the same output_root continues from its
last committed stage — the reference's checkpoint-restart semantics.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from openlogparse_spark.pipeline import PipelineConfig, PipelineResult, run_pipeline


@dataclass
class _Run:
    name: str
    config: PipelineConfig
    group: str = ""              # unique per start: the cancel handle
    future: Future = field(default_factory=Future)
    thread: threading.Thread | None = None
    started: float = 0.0
    finished: float | None = None


class PipelineManager:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._runs: dict[str, _Run] = {}
        self._lock = threading.Lock()
        self._seq = 0

    def start(self, name: str, cfg: PipelineConfig) -> Future:
        """Launch pipeline `name`; returns a Future of its PipelineResult.

        Restarting a finished/stopped name is allowed (that's resume);
        starting a name that is still running raises."""
        with self._lock:
            prev = self._runs.get(name)
            if prev is not None and prev.finished is None:
                raise ValueError(f"pipeline {name!r} is already running")
            self._seq += 1
            # group id unique PER START: cancelJobGroupAndFutureJobs marks a
            # group id cancelled forever, so a restarted pipeline must not
            # reuse the one its predecessor was stopped under
            run = _Run(name=name, config=cfg, group=f"{name}#{self._seq}",
                       started=time.time())
            self._runs[name] = run

        def _go() -> None:
            sc = self.spark.sparkContext
            # thread-local job controls: this thread's jobs — and only
            # these — carry the pipeline's pool (FAIR slice) + group (stop
            # handle)
            sc.setLocalProperty("spark.scheduler.pool", name)
            sc.setJobGroup(run.group, f"pipeline {name}", interruptOnCancel=True)
            try:
                run.future.set_result(run_pipeline(self.spark, cfg))
            except BaseException as e:  # noqa: BLE001 — surfaced via Future
                run.future.set_exception(e)
            finally:
                run.finished = time.time()
                sc.setLocalProperty("spark.scheduler.pool", None)

        run.thread = threading.Thread(target=_go, name=f"pipeline-{name}",
                                      daemon=True)
        run.thread.start()
        return run.future

    def stop(self, name: str) -> None:
        """Cancel the named pipeline — running AND not-yet-submitted Spark
        jobs (ReplicatorManager stop command; plain cancelJobGroup would
        no-op if stop lands between two jobs). The run's Future completes
        with the cancellation error; committed stages stay committed for a
        later resume under a fresh start()."""
        run = self._runs.get(name)
        if run is None:
            raise KeyError(name)
        self.spark.sparkContext._jsc.sc().cancelJobGroupAndFutureJobs(run.group)

    def status(self) -> dict[str, dict]:
        """{name: {state, wall_sec, sink_counts?, error?}} — the manager's
        status endpoint."""
        out: dict[str, dict] = {}
        # snapshot under the lock: status() is the concurrent control-plane
        # endpoint, and a start() mutating _runs mid-iteration would raise
        # "dictionary changed size during iteration"
        with self._lock:
            items = list(self._runs.items())
        for name, run in items:
            end = run.finished or time.time()
            info: dict = {"wall_sec": round(end - run.started, 2)}
            if run.finished is None:
                info["state"] = "running"
            elif run.future.exception() is not None:
                info["state"] = "failed"
                info["error"] = repr(run.future.exception())
            else:
                res: PipelineResult = run.future.result()
                info["state"] = "done"
                info["sink_counts"] = res.sink_counts
            out[name] = info
        return out

    def wait_all(self, timeout: float | None = None) -> dict[str, dict]:
        """Block until every started pipeline finishes; returns status()."""
        deadline = None if timeout is None else time.time() + timeout
        with self._lock:
            runs = list(self._runs.values())
        for run in runs:
            t = run.thread
            if t is not None:
                t.join(None if deadline is None
                       else max(0.0, deadline - time.time()))
        return self.status()
