"""Manifest: per-stage / per-sink lineage, metrics, and idempotent resume.

Reference parity:
  - metadata checkpoints (scn/seq/offset + schema) written as JSON files and
    read back to resume: Metadata::writeCheckpoint/readCheckpoint,
    /root/reference/src/metadata/Metadata.cpp:360-413,415-460;
  - writer checkpoint (confirmed scn,idx) advancing only over a contiguous
    confirmed prefix: Writer::writeCheckpoint/confirmMessage,
    /root/reference/src/writer/Writer.cpp:364-445,106-165;
  - resume gate: already-confirmed messages are skipped on restart
    (Writer::isNewData, Writer.cpp:296-298,336-338).

Here: an append-only parquet manifest table (one small file per record, so
concurrent writers never conflict — the Iceberg-manifest analogue in a
jar-less sandbox) plus an atomic rename commit for sink directories. A stage
re-run first consults `done()`: completed (stage, sink) pairs whose committed
output still exists are skipped, making every stage idempotent. Metrics rows
(rows/bytes per sink) double as the reference's Prometheus counters
(/root/reference/src/common/metrics/Metrics.h:47-129).

Schema (FIXTURES.md §5):
  run_id, stage, sink, partition_id, rows, bytes, status,
  started, finished, snapshot_id
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pandas as pd

MANIFEST_COLS = [
    "run_id", "stage", "sink", "partition_id", "rows", "bytes",
    "status", "started", "finished", "snapshot_id", "watermark",
]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def record(
        self,
        run_id: str,
        stage: str,
        sink: str,
        rows: int,
        nbytes: int,
        status: str = "done",
        partition_id: int = -1,
        started: float | None = None,
        snapshot_id: str | None = None,
        watermark=None,
    ) -> str:
        """`watermark` = the sink's event-time high-water mark (max event ts
        committed) — the reference's confirmedScn progression analogue
        (Writer::confirmMessage, Writer.cpp:106-165): resume/monitoring can
        read how far in event time every sink has advanced."""
        snapshot_id = snapshot_id or uuid.uuid4().hex[:16]
        now = time.time()
        rec = pd.DataFrame(
            [
                {
                    "run_id": run_id,
                    "stage": stage,
                    "sink": sink,
                    "partition_id": partition_id,
                    "rows": int(rows),
                    "bytes": int(nbytes),
                    "status": status,
                    "started": pd.Timestamp(started or now, unit="s").floor("us"),
                    "finished": pd.Timestamp(now, unit="s").floor("us"),
                    "snapshot_id": snapshot_id,
                    "watermark": (pd.Timestamp(watermark).floor("us")
                                  if watermark is not None else pd.NaT),
                }
            ],
            columns=MANIFEST_COLS,
        )
        for c in ("started", "finished", "watermark"):
            rec[c] = rec[c].astype("datetime64[us]")
        fname = os.path.join(self.path, f"m-{time.time_ns()}-{uuid.uuid4().hex[:8]}.parquet")
        rec.to_parquet(fname, index=False)
        return snapshot_id

    def load(self) -> pd.DataFrame:
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".parquet")
        )
        if not files:
            return pd.DataFrame(columns=MANIFEST_COLS)
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    def done(self, stage: str) -> set[str]:
        """Sinks recorded done for `stage` whose committed output still exists."""
        df = self.load()
        if df.empty:
            return set()
        sel = df[(df["stage"] == stage) & (df["status"] == "done")]
        return {s for s in sel["sink"] if s == "" or os.path.exists(s)}

    def counts_by_sink(self) -> dict[tuple[str, str], int]:
        df = self.load()
        out: dict[tuple[str, str], int] = {}
        for _, r in df[df["status"] == "done"].iterrows():
            out[(r["stage"], r["sink"])] = int(r["rows"])
        return out


def atomic_overwrite(df, path: str, partition_by: list[str] | None = None,
                     committer=None) -> None:
    """Write a DataFrame to `path` with snapshot-commit semantics.

    Spark writes into `<path>.__tmp__`, then the configured Committer (see
    route.committer — the Iceberg-commit seam) swaps it in. With the default
    RenameCommitter, readers never observe a half-written mix and no
    committed data is ever lost: a kill mid-swap leaves the old output at
    `path` or recoverable at `<path>.__old__` (the one non-atomic instant is
    between the two renames, where `path` is briefly absent — resume re-runs
    the stage). Dangling `.__tmp__` / `.__old__` dirs are swept on the next
    commit.
    """
    from openlogparse_spark.route.committer import DEFAULT_COMMITTER

    committer = committer or DEFAULT_COMMITTER
    tmp = path + ".__tmp__"
    committer.sweep(path)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    committer.commit(tmp, path)
