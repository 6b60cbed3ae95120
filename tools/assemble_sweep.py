"""Assemble SWEEP_r{N}.json from three verify_local --json runs.

Usage: python tools/assemble_sweep.py ROUND ENGINE_SF001 ENGINE_SF01 PLAIN_SF001 OUT
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    rnd, e001, e01, p001, out = sys.argv[1:6]
    parts = {
        "engine_sf0.01": json.load(open(e001)),
        "engine_sf0.1": json.load(open(e01)),
        "plain_sf0.01": json.load(open(p001)),
    }
    doc = {
        "round": int(rnd),
        "note": (
            "Full registered-query sweep via tools/verify_local.py (the "
            "local mirror of the driver's CORRECTNESS gate: row count, "
            "sorted-column schema, and order-insensitive repr-strict value "
            "comparison vs the DuckDB oracle). 'plain_sf0.01' ran against "
            "a BARE SparkSession (Spark defaults, no engine confs) — the "
            "strict simulation of the driver building its own session. "
            "rows_only entries are the hash-dependent/iterative ops that "
            "have no oracle by design (err=no_oracle)."
        ),
        **parts,
    }
    for name, part in parts.items():
        s = part["summary"]
        assert s["fail"] == 0, (name, s)
    json.dump(doc, open(out, "w"), indent=1)
    print(
        out,
        "written:",
        {k: v["summary"] for k, v in parts.items()},
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
