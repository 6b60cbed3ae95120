"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization uses the noop sink (full execution, no collect-to-driver,
no write amplification) — the honest analog of the reference's
job-wall-time measurement (BASELINE.md: ~551 s for 4.35 GB WordCount on
2x2 vcores => ~7.9 MB/s; we report per-query wall seconds at sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hadoop_spark_pspd_spark.registry import load_all  # noqa: E402
from hadoop_spark_pspd_spark.session import get_spark  # noqa: E402

# streaming queries manage their own materialization (memory sink)
_SELF_MATERIALIZING = ("stream_hourly_counts", "stream_windowed_wordcount")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    reg = load_all()
    names = [n for n, q in sorted(reg.items()) if q.bench]
    # streaming representative included for coverage
    names.append("stream_hourly_counts")
    spark = get_spark("pspd_bench")

    timings: dict[str, float] = {}
    for name in names:
        q = reg[name]
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        if name in _SELF_MATERIALIZING:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
