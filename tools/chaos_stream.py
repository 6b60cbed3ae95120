#!/usr/bin/env python
"""Streaming restart-recovery worker for the chaos harness (T5 on the
TWS surface): run the transformWithStateInPandas per-user profile fold
over a file-source stream, one file per micro-batch, checkpointed — so
an orchestrator (tests/test_chaos_tws_restart.py) can SIGKILL the whole
process group mid-stream and re-invoke the identical command, and the
resumed run must restore typed ValueState from the checkpoint and end
with exactly the uninterrupted run's output.

Reference parity: cluster/tools/run_fault_tests.py:195-226 faults a
node under a streaming job and expects the job to finish with the
fault-free result; tools/chaos_run.py covers the batch/executor analog,
this worker covers the STATEFUL STREAMING analog where the thing that
must survive is the state store itself.

Design notes:
  * file source + maxFilesPerTrigger=1 + Trigger.AvailableNow: batch
    planning is offset-logged, so a killed run's uncommitted batch is
    replayed with the same files and a resumed run processes exactly
    the not-yet-committed remainder.
  * foreachBatch sink writes each micro-batch OVERWRITE into
    out/b<batch_id> — replays after a kill are idempotent.
  * input files are generated per-user ts-ascending ACROSS files, so
    the profile fold is batch-split-invariant and the final per-user
    row is comparable across any kill point.
  * --batch-sleep widens the kill window (the orchestrator kills after
    it has seen >= 2 commits, while later batches are still pending).

Usage:
  python tools/chaos_stream.py INPUT_DIR CKPT_DIR OUT_DIR \
      [--batch-sleep 0.8] [--partitions 2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EVENT_SCHEMA = "user_id long, ts timestamp, value double"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_dir")
    ap.add_argument("ckpt_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--batch-sleep", type=float, default=0.0)
    ap.add_argument("--partitions", type=int, default=2)
    args = ap.parse_args()

    # registry import first: ensure_protobuf() must patch PYTHONPATH
    # before the JVM exists (round-8 technique 3)
    from hadoop_spark_pspd_spark.registry import load_all  # noqa: F401
    from hadoop_spark_pspd_spark.operators.streaming_queries import (
        _tws_runnable,
    )
    from hadoop_spark_pspd_spark.streaming.stateful import (
        user_profile_stream,
        user_profile_stream_tws,
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("chaos_stream_tws")
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", str(args.partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    transform = (
        user_profile_stream_tws
        if _tws_runnable(spark)
        else user_profile_stream
    )
    print(f"[worker] transform={transform.__name__}", flush=True)

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(args.input_dir)
    )
    out_root = Path(args.out_dir)
    sleep_s = args.batch_sleep

    def sink(batch_df, batch_id: int) -> None:
        if sleep_s:
            time.sleep(sleep_s)
        (
            batch_df.write.mode("overwrite")
            .json(str(out_root / f"b{batch_id:05d}"))
        )
        print(f"[worker] wrote batch {batch_id}", flush=True)

    q = (
        transform(src)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", args.ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("[worker] DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
