"""Runnable analog of the reference's fault-injection harness.

The reference's primary artifact is `cluster/tools/run_fault_tests.py`: a
WordCount job monitored by a poll loop while scheduled faults stop cluster
nodes, leaving a JSONL time series + a summary JSON per run
(run_fault_tests.py:229-297,392-407). This demo reproduces that experiment
Spark-natively on one machine:

  * workload  — the engine's WordCount pipeline over the sf0.01 documents
    (read -> explode(split) -> filter -> groupBy.count), the same shape the
    reference runs on Hadoop (run_fault_tests.py:26-30);
  * fault     — a task-level failure injected into the first attempt of one
    partition (the lineage analog of `docker stop` on a worker: Spark
    retries the task from lineage, YARN re-ran the container);
  * monitor   — BatchMonitor emits the reference's JSONL sample schema
    (type/timestamp/elapsed_s/progress/state/live_nodes/node_states) while
    the job runs; fault + recovery are logged as event records;
  * summary   — write_run_summary emits the reference's summary shape
    (app_id/state/duration_seconds/events).

Run: python examples/fault_injection_demo.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_spark_pspd_spark.streaming.listeners import (  # noqa: E402
    BatchMonitor,
    JsonlSink,
    write_run_summary,
)


def flaky_identity(batches):
    """First attempt of partition 0 dies mid-flight — the injected fault."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected fault: node down")
    yield from batches


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pspd_fault_")
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    # local[8,2]: task retries enabled (maxFailures=2), mirroring YARN's
    # re-execution budget
    spark = (
        SparkSession.builder.master("local[8,2]")
        .appName("pspd-fault-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sink = JsonlSink(out_dir / "run.jsonl")
    t0 = time.time()
    events = []

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .repartition(8)
        .mapInPandas(flaky_identity, schema="word string")
        .groupBy("word")
        .count()
    )

    with BatchMonitor(spark, sink, poll_s=0.2):
        sink.append(
            {
                "type": "event",
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "elapsed_s": 0.0,
                "action": "fault_scheduled",
                "target": "partition-0-attempt-0",
            }
        )
        events.append({"action": "fault_injected", "target": "partition 0"})
        n_words = words.count()
        top = words.orderBy(F.desc("count"), F.asc("word")).limit(3).collect()
        events.append({"action": "recovered", "detail": "task retried from lineage"})

    write_run_summary(
        out_dir / "summary.json",
        app_id=spark.sparkContext.applicationId,
        state="FINISHED",
        duration_seconds=time.time() - t0,
        events=events,
        raw={"distinct_words": n_words, "top3": [tuple(r) for r in top]},
    )

    samples = [
        json.loads(line)
        for line in (out_dir / "run.jsonl").read_text().splitlines()
    ]
    print(
        json.dumps(
            {
                "out_dir": str(out_dir),
                "distinct_words": n_words,
                "jsonl_records": len(samples),
                "record_types": sorted({s["type"] for s in samples}),
                "survived_injected_fault": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
