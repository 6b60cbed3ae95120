"""E2E test for the scheduled-fault orchestrator CLI (tools/chaos_run.py),
the reference-parity workflow of cluster/tools/run_fault_tests.py: a
registered query runs to completion under a declarative 2-event fault
schedule (one executor SIGKILL, one SIGSTOP stall), produces the exact
fault-free result (compared by deterministic result hash), and emits the
reference's JSONL sample/event records plus summary JSON."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from tests.test_observability import REF_SAMPLE_KEYS

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"
QUERY = "q1_pricing_summary"

sys.path.insert(0, str(REPO / "tools"))


def test_chaos_cli_two_event_schedule(tmp_path, spark):
    # fault-free baseline on the ordinary test session, hashed with the
    # CLI's own canonicalizer
    import chaos_run

    from hadoop_spark_pspd_spark.registry import load_all

    baseline = load_all()[QUERY].fn(spark, SF).collect()
    want_hash = chaos_run.result_hash(baseline)

    res = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "chaos_run.py"),
            QUERY, SF,
            "--event", "executor:3:0",
            "--event", "stall:8:2",
            "--repeat", "6",
            "--poll", "0.5",
            "--out-dir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=360,
        cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr[-3000:]

    summaries = list(tmp_path.glob("chaos_*.summary.json"))
    assert len(summaries) == 1
    summary = json.loads(summaries[0].read_text())

    # reference summary shape (run_fault_tests.py:392-407)
    assert summary["state"] == "FINISHED"
    assert summary["final_state"] == "FINISHED"
    assert summary["duration_seconds"] > 0
    assert summary["app_id"].startswith("app-")

    # both scheduled events executed, with the reference's schedule
    # record shape (target/offset/downtime/executed_at_s)
    evs = summary["events"]
    assert [e["target"] for e in evs] == ["executor", "stall"]
    for e in evs:
        assert e["executed_at_s"] >= e["offset"]
        assert "pid" in e and "skipped" not in e

    # identical query output under faults: Spark's task retry +
    # shuffle refetch + standalone executor relaunch recovered exactly
    assert summary["raw"]["rows"] == len(baseline)
    assert summary["raw"]["result_hash"] == want_hash

    # JSONL trail: reference sample schema + the injected fault events
    jsonl = Path(summary["raw"]["log_jsonl"])
    recs = [json.loads(x) for x in jsonl.read_text().splitlines()]
    samples = [r for r in recs if r["type"] == "sample"]
    assert samples and set(samples[0]) == REF_SAMPLE_KEYS
    actions = {r.get("action") for r in recs if r["type"] == "event"}
    assert "kill_executor_process" in actions
    assert "stall_executor_process" in actions
    assert recs[-1]["action"] == "run_finished"
    assert recs[-1]["final_state"] == "FINISHED"


def test_chaos_cli_rejects_bad_schedule():
    import chaos_run
    import pytest

    with pytest.raises(Exception):
        chaos_run.parse_event("executor:10")  # not 3 fields
    with pytest.raises(Exception):
        chaos_run.parse_event("hadoop-slave1:10:5")  # unknown target
    ev = chaos_run.parse_event("stall:8:2")
    assert ev == {
        "target": "stall", "offset": 8, "downtime": 2,
        "description": "Stall one executor after 8s for 2s",
    }
