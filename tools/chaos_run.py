#!/usr/bin/env python
"""Scheduled-fault orchestrator CLI — reference-parity workflow with
``cluster/tools/run_fault_tests.py``: a declarative ``target:offset:downtime``
event schedule (:300-313), a default schedule (:343-348), a poll loop
appending reference-schema JSONL samples/events (:229-296), and a final
summary JSON (:392-407) — re-expressed for Spark standalone
``local-cluster`` mode, where the analog of the reference's
``docker stop <node>`` (:195-226) is faulting a REAL executor JVM process:

  * target ``executor`` — SIGKILL the lowest-pid executor backend; the
    standalone Worker relaunches a replacement (downtime is the relaunch
    latency, recorded but not enforced — a crash fault).
  * target ``stall``    — SIGSTOP the process for ``downtime`` seconds,
    then SIGCONT (a transient unreachable-node fault, the closest analog
    of the reference's stop/sleep/start cycle).

The monitored workload is any REGISTERED engine query (``--repeat`` runs
it N times back-to-back so the schedule lands mid-computation, like the
reference's long WordCount job). Spark's task retry + shuffle-refetch +
executor relaunch must deliver the exact fault-free result: the summary
carries a deterministic ``result_hash`` of the final run's collected
output so a harness (tests/test_chaos_cli.py) can compare it against a
fault-free baseline.

Usage:
  python tools/chaos_run.py q1_pricing_summary /root/testdata/sf0.001 \\
      --event executor:2:0 --event stall:6:2 --repeat 10 --poll 0.5

Artifacts (reference naming, ``reports/`` by default):
  chaos_<query>_<ts>.jsonl         poll samples + fault/event records
  chaos_<query>_<ts>.summary.json  run summary (state, duration, events,
                                   result_hash, rows)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TARGETS = ("executor", "stall")


def parse_event(value: str) -> dict:
    """``target:offset:downtime`` (seconds) — run_fault_tests.py:300-313."""
    parts = value.split(":")
    if len(parts) != 3:
        raise argparse.ArgumentTypeError(
            "event format must be target:offset:downtime"
        )
    target, offset, downtime = parts
    if target not in TARGETS:
        raise argparse.ArgumentTypeError(
            f"unknown target '{target}' (one of {TARGETS})"
        )
    return {
        "target": target,
        "offset": int(offset),
        "downtime": int(downtime),
        "description": (
            f"{'Stall' if target == 'stall' else 'Kill'} one executor "
            f"after {offset}s"
            + (f" for {downtime}s" if target == "stall" else "")
        ),
    }


def default_events() -> list[dict]:
    """Scaled-down analog of the reference's 120/420/840s three-node
    schedule (run_fault_tests.py:343-348) for interactive-length runs."""
    return [
        {"target": "executor", "offset": 3, "downtime": 0,
         "description": "Kill one executor after 3s"},
        {"target": "stall", "offset": 8, "downtime": 2,
         "description": "Stall one executor after 8s for 2s"},
    ]


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return sorted(
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line
    )


def perform_event(event: dict, sink, elapsed: float) -> dict:
    """Fault one executor process; append the reference event record
    (run_fault_tests.py:201-208,219-225) and return the schedule record
    shape the summary embeds (:286-293)."""
    pids = executor_pids()
    record = {
        "target": event["target"],
        "offset": event["offset"],
        "downtime": event["downtime"],
        "executed_at_s": round(elapsed, 1),
    }
    if not pids:
        record["skipped"] = "no executor process found"
        action, victim = "fault_skipped", None
    elif event["target"] == "executor":
        victim = pids[0]
        os.kill(victim, signal.SIGKILL)
        action = "kill_executor_process"
    else:
        victim = pids[0]
        os.kill(victim, signal.SIGSTOP)
        threading.Timer(
            event["downtime"],
            lambda: _try_cont(victim),
        ).start()
        action = "stall_executor_process"
    sink.append(
        {
            "type": "event",
            "timestamp": datetime.utcnow().strftime("%Y-%m-%dT%H:%M:%SZ"),
            "elapsed_s": round(elapsed, 1),
            "action": action,
            "target": str(victim),
        }
    )
    record["pid"] = victim
    return record


def _try_cont(pid: int) -> None:
    try:
        os.kill(pid, signal.SIGCONT)
    except ProcessLookupError:
        pass


def result_hash(rows) -> str:
    """Deterministic digest of a collected query result: md5 over the
    row-sorted repr of plain-tuple rows. Same-machine deterministic for
    the engine's queries (whose float outputs follow the repo's
    cross-engine determinism conventions), so a faulted run must equal
    the fault-free baseline bit for bit."""
    canon = sorted(repr(tuple(r)) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def build_session(executors: int, cores: int, mem_mb: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder
        .master(f"local-cluster[{executors},{cores},{mem_mb}]")
        .appName("pspd_chaos_run")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        # survive a dead/stalled executor without failing the app
        .config("spark.task.maxFailures", "8")
        .config("spark.stage.maxConsecutiveAttempts", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Run a registered query under a scheduled-fault "
                    "experiment (reference run_fault_tests.py parity)."
    )
    ap.add_argument("query", help="registered query name (see QUERIES.md)")
    ap.add_argument("sf_dir", help="testdata dir, e.g. /root/testdata/sf0.001")
    ap.add_argument("--event", action="append", type=parse_event,
                    help="fault in target:offset:downtime form "
                         "(targets: executor=SIGKILL, stall=SIGSTOP/CONT)")
    ap.add_argument("--poll", type=float, default=1.0,
                    help="seconds between JSONL samples (reference --poll)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the query N times back-to-back so the "
                         "schedule lands mid-computation")
    ap.add_argument("--out-dir", default="reports")
    ap.add_argument("--executors", type=int, default=2)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--mem-mb", type=int, default=1024)
    ap.add_argument("--no-hash", action="store_true",
                    help="skip collecting the final run for result_hash")
    args = ap.parse_args(argv)

    from hadoop_spark_pspd_spark.registry import load_all
    from hadoop_spark_pspd_spark.streaming.listeners import (
        BatchMonitor, JsonlSink, write_run_summary,
    )

    reg = load_all()
    if args.query not in reg:
        print(f"unknown query '{args.query}'", file=sys.stderr)
        return 2

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    prefix = f"chaos_{args.query}_{datetime.now().strftime('%Y%m%d-%H%M%S')}"
    jsonl_path = out_dir / f"{prefix}.jsonl"
    summary_path = out_dir / f"{prefix}.summary.json"

    events = sorted(
        args.event if args.event else default_events(),
        key=lambda e: e["offset"],
    )

    spark = build_session(args.executors, args.cores, args.mem_mb)
    spark.sparkContext.setLogLevel("ERROR")
    sink = JsonlSink(jsonl_path)
    triggered: list[dict] = []
    state = "FINISHED"
    rows = None
    digest = None
    t0 = time.time()

    stop_sched = threading.Event()

    def scheduler() -> None:
        idx = 0
        while idx < len(events) and not stop_sched.is_set():
            elapsed = time.time() - t0
            if elapsed >= events[idx]["offset"]:
                triggered.append(perform_event(events[idx], sink, elapsed))
                idx += 1
            else:
                stop_sched.wait(0.05)

    sched = threading.Thread(target=scheduler, daemon=True)
    try:
        with BatchMonitor(spark, sink, poll_s=args.poll):
            sched.start()
            for i in range(args.repeat):
                df = reg[args.query].fn(spark, args.sf_dir)
                if i == args.repeat - 1 and not args.no_hash:
                    collected = df.collect()
                    rows = len(collected)
                    digest = result_hash(collected)
                else:
                    rows = df.count()
                spark.catalog.clearCache()
    except Exception as exc:  # noqa: BLE001
        state = "FAILED"
        sink.append(
            {
                "type": "event",
                "timestamp": datetime.utcnow().strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
                "elapsed_s": round(time.time() - t0, 1),
                "action": "run_failed",
                "target": repr(exc)[:200],
            }
        )
    finally:
        stop_sched.set()
        duration = time.time() - t0
        write_run_summary(
            summary_path,
            app_id=spark.sparkContext.applicationId,
            state=state,
            duration_seconds=duration,
            events=triggered,
            raw={
                "query": args.query,
                "sf_dir": args.sf_dir,
                "repeat": args.repeat,
                "rows": rows,
                "result_hash": digest,
                "log_jsonl": str(jsonl_path),
            },
        )
        spark.stop()

    print(summary_path.read_text())
    return 0 if state == "FINISHED" else 1


if __name__ == "__main__":
    sys.exit(main())
