"""End-to-end demo of the reference's streaming pipeline (docs/README.md:257,
PSPD_LabHadoopSpark.pdf p.2 B2), source/sink-swapped for a broker-less env:

  B2 spec step                      | here
  ----------------------------------+----------------------------------
  1-3  Discord bot -> Kafka topic   | a producer thread appending JSONL
       `canalinput`                 | files to a spool dir (same unbounded
                                    | message semantics; swap in
                                    | streaming.wordcount_stream.kafka_source
                                    | when a broker exists)
  4    Spark consumes the stream    | spark.readStream.json(spool)
  5    split into words, explode    | windowed_wordcount()
  6    uppercase                    |   "
  7    windowed count + late data   |   " (1-min tumbling + 2-min watermark)
  8    JSON to `canaloutput`        | to_kafka_json() -> console + JSONL dir

Run: python examples/streaming_wordcount_demo.py [seconds=20]
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import threading
import time
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_spark_pspd_spark.session import get_spark
from hadoop_spark_pspd_spark.streaming.listeners import (
    JsonlSink,
    StreamObservabilityListener,
)
from hadoop_spark_pspd_spark.streaming.wordcount_stream import (
    to_kafka_json,
    windowed_wordcount,
)

MESSAGES = [
    "ola mundo", "spark streaming demo", "tolerancia a falhas",
    "ola spark", "mundo distribuido", "contagem de palavras",
]


def producer(spool: Path, stop: threading.Event) -> None:
    """Stands in for the Discord->Kafka producer (B2 steps 1-3)."""
    i = 0
    while not stop.is_set():
        now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
        msg = {"timestamp": now, "value": random.choice(MESSAGES)}
        (spool / f"msg_{i:06d}.json").write_text(json.dumps(msg) + "\n")
        i += 1
        stop.wait(0.25)


def main(run_seconds: int = 20) -> None:
    workdir = Path(tempfile.mkdtemp(prefix="pspd_stream_demo_"))
    spool = workdir / "canalinput"
    spool.mkdir()
    spark = get_spark("streaming_wordcount_demo")

    obs = StreamObservabilityListener(JsonlSink(workdir / "observability.jsonl"))
    spark.streams.addListener(obs)

    stop = threading.Event()
    t = threading.Thread(target=producer, args=(spool, stop), daemon=True)
    t.start()

    stream = spark.readStream.schema("timestamp timestamp, value string").json(
        str(spool)
    )
    counts = windowed_wordcount(
        stream,
        ts_col="timestamp",
        text_col="value",
        window_duration="1 minute",
        watermark_delay="2 minutes",
    )
    # For a real deployment the sink is kafka_sink(to_kafka_json(counts),
    # bootstrap, "canaloutput") in update mode; a file sink only supports
    # append (emits each window once the watermark closes it), which a
    # 20-second demo never reaches — so the demo prints from a memory sink
    # and shows the exact JSON record shape below.
    query = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("demo_counts")
        .trigger(processingTime="2 seconds")
        .start()
    )

    print(f"streaming for {run_seconds}s (spool: {spool}) ...")
    time.sleep(run_seconds)
    stop.set()
    query.processAllAvailable()
    query.stop()

    result = spark.sql(
        "SELECT window.start AS window_start, word, cnt "
        "FROM demo_counts ORDER BY window_start, cnt DESC, word"
    )
    rows = result.collect()
    print(f"\n=== windowed word counts ({len(rows)} rows) ===")
    for r in rows[:20]:
        print(f"  {r['window_start']}  {r['word']:<12} {r['cnt']}")
    print("\n=== reference JSON output shape (B2 step 8) ===")
    sample = to_kafka_json(
        spark.sql("SELECT window, word, cnt FROM demo_counts LIMIT 3")
    ).collect()
    for r in sample:
        print(" ", r["value"])
    print(f"\nobservability log: {workdir / 'observability.jsonl'}")
    spark.streams.removeListener(obs)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
