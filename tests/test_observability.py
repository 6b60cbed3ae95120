"""Observability + fault-tolerance parity (SURVEY §5.2-4, reference §2.12).

The reference validates behavior under faults with a JSONL time series +
summary; here: (a) the engine's JSONL records carry the reference's sample/
event schema; (b) Spark re-executes failed tasks and still produces the
correct result — the lineage analog of YARN container retry
(docs/README.md:197,215-216)."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap
import time

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.wordcount import wordcount_df
from hadoop_spark_pspd_spark.streaming.listeners import (
    BatchMonitor,
    JsonlSink,
    StreamObservabilityListener,
    write_run_summary,
)

# keys of the reference's sample record (run_fault_tests.py:250-261)
REF_SAMPLE_KEYS = {
    "type", "timestamp", "elapsed_s", "progress", "state",
    "am_host", "live_nodes", "node_states",
}


def test_batch_monitor_emits_reference_schema(spark, tmp_path):
    sink = JsonlSink(tmp_path / "run.jsonl")
    with BatchMonitor(spark, sink, poll_s=0.2):
        corpus = spark.range(200_000).select(
            F.concat_ws(" ", F.lit("a b c"), (F.col("id") % 97).cast("string"))
            .alias("value")
        )
        assert wordcount_df(corpus).count() == 100
        time.sleep(0.5)  # guarantee at least one mid-run sample
    records = [
        json.loads(line)
        for line in (tmp_path / "run.jsonl").read_text().splitlines()
    ]
    samples = [r for r in records if r["type"] == "sample"]
    events = [r for r in records if r["type"] == "event"]
    assert samples, "expected at least one sample"
    assert set(samples[0]) == REF_SAMPLE_KEYS
    assert events[-1]["action"] == "run_finished"
    assert events[-1]["final_state"] == "FINISHED"
    assert all(s["live_nodes"] >= 1 for s in samples)

    summary = tmp_path / "summary.json"
    write_run_summary(
        summary, spark.sparkContext.applicationId, "FINISHED", 1.23, events
    )
    s = json.loads(summary.read_text())
    assert {"app_id", "state", "final_state", "duration_seconds", "events"} <= set(s)


def test_stream_listener_emits_samples(spark, tmp_path):
    sink = JsonlSink(tmp_path / "stream.jsonl")
    listener = StreamObservabilityListener(sink)
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "src"
        src.mkdir()
        (src / "a.json").write_text(
            '{"timestamp":"2024-01-01T00:00:10","value":"x y"}\n'
        )
        q = (
            spark.readStream.schema("timestamp timestamp, value string")
            .json(str(src))
            .groupBy("value")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("obs_test_sink")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # terminated event is delivered asynchronously
        deadline = time.time() + 10
        while time.time() < deadline:
            lines = (tmp_path / "stream.jsonl").read_text().splitlines()
            recs = [json.loads(x) for x in lines]
            if any(
                r.get("action") == "query_terminated"
                and r.get("final_state") == "FINISHED"
                for r in recs
            ):
                break
            time.sleep(0.2)
        recs = [
            json.loads(x)
            for x in (tmp_path / "stream.jsonl").read_text().splitlines()
        ]
        assert any(r["type"] == "sample" for r in recs)
        assert any(r.get("action") == "query_started" for r in recs)
        assert any(
            r.get("action") == "query_terminated"
            and r.get("final_state") == "FINISHED"
            for r in recs
        )
        sample = next(r for r in recs if r["type"] == "sample")
        assert set(sample) == REF_SAMPLE_KEYS
    finally:
        spark.streams.removeListener(listener)


_CHAOS_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F

    # local[4,2]: 4 threads, maxFailures=2 -> task retry enabled, the
    # lineage analog of the reference's YARN re-execution
    spark = (
        SparkSession.builder.master("local[4,2]").appName("chaos")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def flaky(batches):
        from pyspark import TaskContext
        ctx = TaskContext.get()
        # first attempt of partition 0 dies mid-flight (the injected fault)
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected fault: node down")
        yield from batches

    df = (
        spark.range(0, 1000, 1, 4)
        .mapInPandas(flaky, schema="id long")
        .groupBy((F.col("id") % 10).alias("k"))
        .count()
        .orderBy("k")
    )
    rows = df.collect()
    assert len(rows) == 10 and all(r["count"] == 100 for r in rows), rows
    print("CHAOS_OK")
    """
)


def test_task_retry_recovers_injected_fault(tmp_path):
    """Injected task failure -> Spark retries the task -> correct result.
    Runs in a subprocess because task retries need a local[N,F] master."""
    script = tmp_path / "chaos.py"
    script.write_text(_CHAOS_SCRIPT)
    res = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "CHAOS_OK" in res.stdout, f"stdout={res.stdout}\nstderr={res.stderr[-2000:]}"


_PROC_CHAOS_SCRIPT = textwrap.dedent(
    """
    import json, os, re, signal, subprocess, sys, threading, time

    sys.path.insert(0, "/root/repo")
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

    from pyspark.sql import SparkSession, functions as F

    from hadoop_spark_pspd_spark.streaming.listeners import (
        BatchMonitor, JsonlSink, write_run_summary,
    )

    OUT = sys.argv[1]

    # local-cluster = real standalone Master/Worker/executor JVM PROCESSES
    # (not threads): the only sandbox-runnable analog of the reference's
    # `docker stop`-based node kills (run_fault_tests.py:195-226). Task
    # retry + shuffle-refetch + standalone executor relaunch all engage.
    spark = (
        SparkSession.builder.master("local-cluster[2,2,1024]")
        .appName("proc_chaos")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.task.maxFailures", "8")
        # a dead executor must not blacklist the app out of capacity
        .config("spark.stage.maxConsecutiveAttempts", "8")
        # AQE off: it materializes each stage as its own short-lived job
        # (the kill trigger below watches the LIVE job's stage progress)
        # and would coalesce the 8 reduce partitions to 1, removing the
        # second reduce wave whose post-kill shuffle fetch this test is
        # about
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def executor_pids():
        out = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True
        ).stdout
        return [
            int(line.split(None, 1)[0])
            for line in out.splitlines()
            if "CoarseGrainedExecutorBackend" in line
        ]

    def live_backend_ports():
        infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
        # (host, port) identifies the executor PROCESS; the replacement
        # executor binds a fresh port, which is the relaunch evidence
        return {(i.host(), i.port()) for i in infos}

    # wait for both initial executors to register
    deadline = time.time() + 60
    while len(executor_pids()) < 2 and time.time() < deadline:
        time.sleep(0.5)
    assert len(executor_pids()) >= 2, "executors never registered"

    sink = JsonlSink(OUT)
    seen_ports = set()
    killed = {}
    max_stage_attempt = {"v": 0}

    def map_stage_done():
        tr = spark.sparkContext.statusTracker()
        for jid in tr.getActiveJobsIds():
            ji = tr.getJobInfo(jid)
            if not ji:
                continue
            for sid in ji.stageIds:
                si = tr.getStageInfo(sid)
                if si and si.numTasks == 16 and si.numCompletedTasks == 16:
                    return True
        return False

    def killer():
        # kill AFTER the 16-task map stage finishes (its shuffle files
        # now live only in the executor processes) and DURING the slow
        # reduce wave — so wave-2 reduce tasks must fetch map output
        # from a dead process: the Shuffle fetch-failure -> map-stage
        # re-execution path the reference's node-kill runs exercise
        # (reports/fault_test_20251115-195241.job.log:40,48)
        deadline = time.time() + 120
        while not map_stage_done() and time.time() < deadline:
            time.sleep(0.05)
        pids = executor_pids()
        if pids:
            victim = pids[0]
            os.kill(victim, signal.SIGKILL)
            killed["pid"] = victim
            sink.append({
                "type": "event", "timestamp": "injected",
                "elapsed_s": None, "action": "kill_executor_process",
                "target": str(victim),
            })
        tr = spark.sparkContext.statusTracker()
        for _ in range(480):
            try:
                seen_ports.update(live_backend_ports())
                for sid in tr.getActiveStageIds():
                    si = tr.getStageInfo(sid)
                    if si:
                        max_stage_attempt["v"] = max(
                            max_stage_attempt["v"], si.currentAttemptId
                        )
            except Exception:
                pass
            time.sleep(0.25)

    def slow_map(batches):
        import time as _t
        _t.sleep(1.0)
        yield from batches

    def slow_reduce(batches):
        import time as _t
        for b in batches:   # shuffle rows are FETCHED here, pre-kill for
            _t.sleep(3.0)   # wave 1; wave 2 starts post-kill and must
            yield b         # refetch from the dead executor

    t = threading.Thread(target=killer, daemon=True)
    with BatchMonitor(spark, sink, poll_s=0.5):
        seen_ports.update(live_backend_ports())
        t.start()
        df = (
            spark.range(0, 160_000, 1, 16)
            .mapInPandas(slow_map, schema="id long")
            .groupBy((F.col("id") % 100).alias("k"))
            .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
            .mapInPandas(slow_reduce, schema="k long, n long, s long")
        )
        rows = {r["k"]: (r["n"], r["s"]) for r in df.collect()}

    # ground truth computed driver-side
    import collections
    exp_n = collections.Counter()
    exp_s = collections.Counter()
    for i in range(160_000):
        exp_n[i % 100] += 1
        exp_s[i % 100] += i
    assert rows == {k: (exp_n[k], exp_s[k]) for k in exp_n}, "WRONG RESULT"
    assert "pid" in killed, "no executor was killed"
    assert killed["pid"] not in executor_pids(), "victim survived SIGKILL"
    print("SEEN_PORTS", len(seen_ports))
    print("STAGE_RETRY", max_stage_attempt["v"])
    print("PROC_CHAOS_OK")
    spark.stop()
    """
)


def test_executor_process_kill_recovers(tmp_path):
    """SIGKILL a real executor JVM mid-query (local-cluster mode) ->
    Spark re-executes the lost tasks (shuffle-fetch failure path, the
    analog of the reference's docker-stop node fault,
    run_fault_tests.py:195-226) -> results identical to ground truth,
    and the JSONL trail carries the reference sample schema plus the
    injected fault event."""
    out = tmp_path / "proc_chaos.jsonl"
    script = tmp_path / "proc_chaos.py"
    script.write_text(_PROC_CHAOS_SCRIPT)
    res = subprocess.run(
        [sys.executable, str(script), str(out)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "PROC_CHAOS_OK" in res.stdout, (
        f"stdout={res.stdout}\nstderr={res.stderr[-3000:]}"
    )
    recs = [json.loads(x) for x in out.read_text().splitlines()]
    samples = [r for r in recs if r["type"] == "sample"]
    assert samples and set(samples[0]) == REF_SAMPLE_KEYS
    assert any(
        r.get("action") == "kill_executor_process" for r in recs
    ), "fault event missing from the JSONL trail"
    assert recs[-1]["action"] == "run_finished"
    assert recs[-1]["final_state"] == "FINISHED"
    # replacement executor binds a fresh port -> >2 distinct backend
    # endpoints observed over the run proves a real process died and a
    # new one took over mid-query
    seen = int(
        next(
            line.split()[1]
            for line in res.stdout.splitlines()
            if line.startswith("SEEN_PORTS")
        )
    )
    assert seen >= 3, f"no executor relaunch observed (endpoints={seen})"
    # the kill lands after the map stage's shuffle files exist only in
    # the executor processes, so a reduce task fetching from the dead
    # one raises FetchFailed and Spark RESUBMITS the map stage — visible
    # as a stage attempt id > 0 (task-level retries alone never bump it)
    retries = int(
        next(
            line.split()[1]
            for line in res.stdout.splitlines()
            if line.startswith("STAGE_RETRY")
        )
    )
    assert retries >= 1, (
        "no shuffle-fetch-failure stage resubmission observed "
        f"(max stage attempt={retries})"
    )
