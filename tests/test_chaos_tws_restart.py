"""Restart-recovery chaos test for the transformWithStateInPandas
surface (VERDICT r10 item 7): a TWS streaming query is SIGKILLed
mid-stream (whole process group — driver JVM included, a genuine
crash with an uncommitted micro-batch) and re-invoked on the same
checkpoint; the state store must restore and the resumed run's final
per-user profiles must equal (a) the uninterrupted run's and (b) the
ground truth folded directly from the input — i.e. exactly-once state
across the crash, no double-counted and no lost events.

Input files are generated per-user ts-ascending across files so the
profile fold is batch-split-invariant (any kill point yields the same
final rows); tools/chaos_stream.py documents the replay/idempotence
reasoning.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tools" / "chaos_stream.py"

N_FILES = 8
USERS = (0, 1, 2, 3, 4)
BASE_US = 1_700_000_000_000_000  # fixed epoch anchor, micros


def _gen_input(input_dir: Path) -> dict[int, dict]:
    """Write N_FILES json event files; file k holds hour-k events, so
    every user's stream is ts-ordered across files. Returns the ground
    truth per-user profile folded the way the processor folds."""
    input_dir.mkdir(parents=True)
    per_user: dict[int, list[tuple[int, float]]] = {u: [] for u in USERS}
    for k in range(N_FILES):
        rows = []
        for u in USERS:
            if (k + u) % 3 == 0:  # irregular presence -> real gaps
                continue
            ts_us = BASE_US + k * 3_600_000_000 + u * 60_000_000
            value = float(u + 1) * 0.5 + k
            per_user[u].append((ts_us, value))
            rows.append(
                {
                    "user_id": u,
                    "ts": time.strftime(
                        "%Y-%m-%dT%H:%M:%S.%%06dZ",
                        time.gmtime(ts_us // 1_000_000),
                    )
                    % (ts_us % 1_000_000),
                    "value": value,
                }
            )
        path = input_dir / f"events_{k:03d}.json"
        path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        # pin STRICTLY INCREASING mtimes: Spark's FileStreamSource
        # orders batches by file modification time, and same-tick
        # writes leave the order to the FS listing — the per-user
        # ts-ascending arrival contract the gap fold relies on was
        # otherwise load-dependent (caught by a concurrent full-suite
        # run: a reordered pair inflated max_gap_s by one hour)
        mtime = 1_700_000_000 + k
        os.utime(path, (mtime, mtime))
    truth = {}
    for u, evs in per_user.items():
        n, total, last, gap = 0, 0.0, None, 0
        for ts_us, value in evs:
            if last is not None:
                gap = max(gap, ts_us - last)
            last = ts_us
            n += 1
            total += value
        truth[u] = {
            "n_events": n,
            "total_value": total,
            "max_gap_s": gap / 1e6,
        }
    return truth


def _final_profiles(out_dir: Path) -> dict[int, dict]:
    """Per user, the emission from the highest batch id (update mode
    re-emits a user whenever one of its events lands in a batch)."""
    latest: dict[int, tuple[int, dict]] = {}
    for bdir in sorted(out_dir.glob("b*")):
        bid = int(bdir.name[1:])
        for part in bdir.glob("part-*.json"):
            for line in part.read_text().splitlines():
                if not line.strip():
                    continue
                row = json.loads(line)
                u = int(row["user_id"])
                if u not in latest or bid >= latest[u][0]:
                    latest[u] = (bid, row)
    return {
        u: {
            "n_events": int(r["n_events"]),
            "total_value": float(r["total_value"]),
            "max_gap_s": float(r["max_gap_s"]),
        }
        for u, (_, r) in latest.items()
    }


def _run_worker(input_dir, ckpt, out, batch_sleep=0.0, kill_after=None):
    """Run the worker; if kill_after is set, SIGKILL the whole process
    group once that many commits exist, and return the poll result."""
    cmd = [
        sys.executable, str(WORKER), str(input_dir), str(ckpt), str(out),
        "--batch-sleep", str(batch_sleep),
    ]
    p = subprocess.Popen(
        cmd, cwd=str(REPO), start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    if kill_after is None:
        out_text, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out_text[-3000:]
        assert "[worker] DONE" in out_text
        return None
    commits = Path(ckpt) / "commits"
    deadline = time.time() + 300
    while time.time() < deadline:
        n = len(list(commits.glob("[0-9]*"))) if commits.exists() else 0
        if n >= kill_after:
            break
        if p.poll() is not None:  # finished before we could kill: the
            raise AssertionError(   # fixture must leave batches pending
                "worker finished before the kill window"
            )
        time.sleep(0.1)
    else:
        raise AssertionError("kill window never opened (no commits)")
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait(timeout=60)
    assert p.returncode != 0  # it really was killed, not a clean exit
    return None


def test_tws_restart_recovers_state(tmp_path):
    input_dir = tmp_path / "input"
    truth = _gen_input(input_dir)

    # uninterrupted reference run
    _run_worker(input_dir, tmp_path / "ckpt_ref", tmp_path / "out_ref")
    ref = _final_profiles(tmp_path / "out_ref")
    assert set(ref) == set(truth)
    for u in truth:
        assert ref[u]["n_events"] == truth[u]["n_events"]
        assert abs(ref[u]["total_value"] - truth[u]["total_value"]) == 0.0
        assert abs(ref[u]["max_gap_s"] - truth[u]["max_gap_s"]) == 0.0

    # crash run: SIGKILL the process group after 2 committed batches
    # (uncommitted batch 2+ in flight), then resume on the checkpoint
    ckpt, out = tmp_path / "ckpt_chaos", tmp_path / "out_chaos"
    _run_worker(input_dir, ckpt, out, batch_sleep=0.8, kill_after=2)
    n_commits_at_kill = len(list((ckpt / "commits").glob("[0-9]*")))
    assert n_commits_at_kill < N_FILES  # the kill landed mid-stream

    _run_worker(input_dir, ckpt, out)  # resume to completion
    got = _final_profiles(out)

    assert got == ref  # state restored: crash run == uninterrupted run
