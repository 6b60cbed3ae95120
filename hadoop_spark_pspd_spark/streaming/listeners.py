"""Observability: JSONL sample/event records with the reference's schema.

The reference's harness polls YARN every N seconds and appends JSONL
samples — run_fault_tests.py:250-261:
  {type, timestamp, elapsed_s, progress, state, am_host, live_nodes,
   node_states}
and event records (:201-208,219-225):
  {type: "event", timestamp, elapsed_s, action, target}
plus a final run summary (:392-407):
  {app_id, state, final_state, duration_seconds, events, ...}

The engine emits the same shapes from Spark's own instrumentation:
  * streams  — a StreamingQueryListener (micro-batch progress == the
    reference's map/reduce % progress line)
  * batch    — a poll thread over SparkContext.statusTracker (the direct
    analog of the reference's `yarn application -status` loop)
  * summary  — written at run end from collected samples/events.
"""

from __future__ import annotations

import json
import threading
import time
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


def _now_iso() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


class JsonlSink:
    """Append-only JSONL file (reference S5 sink shape), thread-safe."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()

    def append(self, record: dict) -> None:
        with self._lock:
            with self.path.open("a") as f:
                f.write(json.dumps(record, default=str) + "\n")


class StreamObservabilityListener(StreamingQueryListener):
    """Emits reference-schema samples per micro-batch progress event."""

    def __init__(self, sink: JsonlSink):
        self.sink = sink
        self.started_at = time.time()
        self.events: list[dict] = []

    def onQueryStarted(self, event) -> None:
        rec = {
            "type": "event",
            "timestamp": _now_iso(),
            "elapsed_s": 0.0,
            "action": "query_started",
            "target": str(event.id),
        }
        self.events.append(rec)
        self.sink.append(rec)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.sink.append(
            {
                "type": "sample",
                "timestamp": _now_iso(),
                "elapsed_s": round(time.time() - self.started_at, 1),
                "progress": {
                    "batch_id": p.batchId,
                    "input_rows": p.numInputRows,
                    "rows_per_sec": p.processedRowsPerSecond,
                },
                "state": "RUNNING",
                "am_host": None,  # no YARN AM; driver-coordinated
                "live_nodes": None,  # filled by the batch monitor variant
                "node_states": {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        state = "FAILED" if event.exception else "FINISHED"
        rec = {
            "type": "event",
            "timestamp": _now_iso(),
            "elapsed_s": round(time.time() - self.started_at, 1),
            "action": "query_terminated",
            "target": str(event.id),
            "final_state": state,
        }
        self.events.append(rec)
        self.sink.append(rec)

    def onQueryIdle(self, event) -> None:
        pass


class BatchMonitor:
    """Poll-thread analog of the reference's monitor loop
    (run_fault_tests.py:229-297): samples executor liveness + job progress
    every `poll_s` seconds while a batch action runs."""

    def __init__(self, spark: SparkSession, sink: JsonlSink, poll_s: float = 1.0):
        self.spark = spark
        self.sink = sink
        self.poll_s = poll_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.started_at: float | None = None

    def _executor_states(self) -> dict[str, str]:
        sc = self.spark.sparkContext
        try:
            infos = sc._jsc.sc().statusTracker().getExecutorInfos()
            return {info.host(): "RUNNING" for info in infos}
        except Exception:  # noqa: BLE001
            return {}

    def _sample(self) -> None:
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        active = tracker.getActiveJobsIds()
        progress = None
        if active:
            stage_ids = tracker.getJobInfo(active[0]).stageIds
            done = total = 0
            for sid in stage_ids:
                si = tracker.getStageInfo(sid)
                if si:
                    done += si.numCompletedTasks
                    total += si.numTasks
            progress = round(done / total, 4) if total else None
        nodes = self._executor_states()
        self.sink.append(
            {
                "type": "sample",
                "timestamp": _now_iso(),
                "elapsed_s": round(time.time() - self.started_at, 1),
                "progress": progress,
                "state": "RUNNING" if active else "IDLE",
                "am_host": None,
                "live_nodes": len(nodes),
                "node_states": nodes,
            }
        )

    def __enter__(self) -> "BatchMonitor":
        self.started_at = time.time()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self) -> None:
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.poll_s)

    def __exit__(self, exc_type, exc, tb) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        self.sink.append(
            {
                "type": "event",
                "timestamp": _now_iso(),
                "elapsed_s": round(time.time() - self.started_at, 1),
                "action": "run_finished",
                "target": "batch",
                "final_state": "FAILED" if exc_type else "FINISHED",
            }
        )


def write_run_summary(
    path: str | Path,
    app_id: str,
    state: str,
    duration_seconds: float,
    events: list[dict],
    raw: dict | None = None,
) -> None:
    """Reference summary shape (run_fault_tests.py:392-407)."""
    Path(path).write_text(
        json.dumps(
            {
                "app_id": app_id,
                "state": state,
                "final_state": state,
                "duration_seconds": round(duration_seconds, 3),
                "events": events,
                "raw": raw or {},
            },
            indent=2,
            default=str,
        )
    )
