"""Thinnest cluster smoke entrypoint: run one registered query under
whatever SparkSession the environment provides (spark-submit on YARN/
standalone/k8s, or a bare `python tools/run_query.py ...` locally).

Usage:
    spark-submit [--master yarn ...] --py-files pspd_engine.zip \
        tools/run_query.py <query_name> <sf_dir> [limit]

Builds the session via getOrCreate() with NO master override, so the
cluster manager's configuration wins — the engine's only requirement
(UTC session tz, nanosAsLong for events) is pinned per-query by
catalog.Tables, exactly as in the driver-gate simulation.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from hadoop_spark_pspd_spark.registry import load_all  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        reg = load_all()
        print(__doc__)
        print("registered queries:", ", ".join(sorted(reg)))
        return 2
    name, sf_dir = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    reg = load_all()
    if name not in reg:
        print(f"unknown query {name!r}; see `python tools/run_query.py`")
        return 2
    spark = SparkSession.builder.appName(f"pspd_smoke_{name}").getOrCreate()
    t0 = time.time()
    df = reg[name].fn(spark, sf_dir)
    n = df.count()
    wall = time.time() - t0
    print(f"{name}: {n} rows in {wall:.1f}s on "
          f"master={spark.sparkContext.master}")
    # sample fetch is a second (limit-pruned) execution — timed run above
    for r in df.limit(limit).collect():
        print("  ", r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
