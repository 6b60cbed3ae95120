#!/usr/bin/env python
"""Single-command full test suite: the three documented CLAUDE.md
chunks run CONCURRENTLY as subprocesses (pytest-xdist is not shipped
in this environment, so this is the sharded-session equivalent — one
Spark session per chunk process, no shared JVM state).

Usage:
    python tools/run_full_suite.py [extra pytest args...]

Exit code is non-zero if any chunk fails; each chunk's tail is
printed with attribution. Wall target: green in <10 min under
ambient load (the serial 3-chunk invocation is the fallback when
memory is tight — each chunk alone stays <5 min).
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHUNKS: dict[str, list[str]] = {
    "oracle_parity": ["tests/test_oracle_parity.py"],
    "streaming": [
        "tests/test_streaming.py",
        "tests/test_stateful_skew.py",
        "tests/test_stream_join_bucketing.py",
        "tests/test_kafka_wire.py",
        "tests/test_observability.py",
        "tests/test_chaos_cli.py",
        "tests/test_chaos_tws_restart.py",
    ],
    "rest": [
        "tests/",
        "--ignore", "tests/test_oracle_parity.py",
        "--ignore", "tests/test_streaming.py",
        "--ignore", "tests/test_stateful_skew.py",
        "--ignore", "tests/test_stream_join_bucketing.py",
        "--ignore", "tests/test_kafka_wire.py",
        "--ignore", "tests/test_observability.py",
        "--ignore", "tests/test_chaos_cli.py",
        "--ignore", "tests/test_chaos_tws_restart.py",
    ],
}


def main() -> int:
    extra = sys.argv[1:]
    t0 = time.time()
    procs: dict[str, tuple[subprocess.Popen, object]] = {}
    for name, paths in CHUNKS.items():
        out = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f"_{name}.log", delete=False
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", *paths, "-q", *extra],
            cwd=str(REPO),
            stdout=out,
            stderr=subprocess.STDOUT,
        )
        procs[name] = (p, out)
        print(f"[suite] launched chunk {name} (pid {p.pid})", flush=True)
    rc = 0
    for name, (p, out) in procs.items():
        chunk_rc = p.wait()
        out.flush()
        tail = Path(out.name).read_text()[-1200:]
        status = "PASS" if chunk_rc == 0 else f"FAIL rc={chunk_rc}"
        print(f"\n===== chunk {name}: {status} ({out.name}) =====")
        print(tail, flush=True)
        rc = rc or chunk_rc
    print(
        f"\n[suite] total wall {time.time() - t0:.1f}s — "
        + ("ALL GREEN" if rc == 0 else "FAILURES (see chunk logs)")
    )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
