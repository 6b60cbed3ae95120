"""End-to-end training-data pipeline demo:
curate -> semantic dedup -> chunk -> sample -> land.

Composes the engine's north-star operators the way a pretraining-data job
would at 100 TB, then writes the result as hash-partitioned parquet:

  curated_documents (quality gate + exact dedup + LSH near-dup components,
  oracle-checked as the registered `pipeline_curate` query)
    -> embedding-level semantic dedup (sim_semantic_dedup keep-list:
       cosine near-dup pairs from the provably-complete cell-pair
       prefilter -> connected components -> one representative per
       semantic cluster; joined on doc_id = vec_id)
    -> fixed-size token chunks with stride (q_chunk_documents machinery)
    -> deterministic hash sample (reproducible; no sort, no RNG state)
    -> parquet partitioned by shard = crc32(doc_id) % N_SHARDS

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
Prints one JSON summary line. Every stage is shuffle-bounded and
driver-light: nothing but the final counters ever reaches the driver.
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.functions.text import tokens
from hadoop_spark_pspd_spark.operators.pipeline import curated_documents
from hadoop_spark_pspd_spark.session import get_spark

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48
SAMPLE_MOD = 10  # keep chunks where crc32(key) % 10 < 8  (80%)
SAMPLE_KEEP = 8
N_SHARDS = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pspd_training_data"
    spark = get_spark("pspd_training_pipeline")

    curated = curated_documents(spark, sf_dir)

    # semantic dedup: keep one representative per embedding-cosine
    # cluster (keep-list semi-join; vec_id aligns with doc_id in the
    # testdata). Text-level dedup above caught exact/shingle dups;
    # this catches paraphrase-level ones.
    from hadoop_spark_pspd_spark.operators.similarity import (
        sim_semantic_dedup,
    )

    keep = (
        sim_semantic_dedup(spark, sf_dir)
        .where(F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    curated = curated.join(keep, "doc_id", "left_semi")

    # chunk: explode each doc into CHUNK_TOKENS-token windows with stride
    w = tokens(F.col("text"))
    docs = curated.select("doc_id", w.alias("w")).filter(F.size("w") > 0)
    n_chunks = (
        F.ceil(
            F.greatest(F.size("w") - F.lit(CHUNK_TOKENS), F.lit(0))
            / F.lit(float(CHUNK_STRIDE))
        ).cast("int")
        + 1
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    chunks = (
        docs.select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .filter(start < F.size("w"))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(" ", F.slice("w", start + 1, CHUNK_TOKENS))
            .alias("chunk_text"),
            F.least(F.lit(CHUNK_TOKENS), F.size("w") - start)
            .cast("int")
            .alias("chunk_len"),
        )
    )

    # deterministic sample: content-independent key hash, no RNG state
    key = F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"))
    sampled = chunks.filter(F.crc32(key) % SAMPLE_MOD < SAMPLE_KEEP)

    # land: hash-sharded parquet (shard count = writer parallelism at scale)
    shutil.rmtree(out_dir, ignore_errors=True)
    landed = sampled.withColumn(
        "shard", (F.crc32(F.col("doc_id").cast("string")) % N_SHARDS).cast("int")
    )
    landed.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    summary = {
        "sf_dir": sf_dir,
        "curated_docs": curated.count(),
        "chunks": chunks.count(),
        "sampled_chunks": back.count(),
        "total_tokens": back.agg(F.sum("chunk_len")).collect()[0][0],
        "shards": back.select("shard").distinct().count(),
        "out_dir": out_dir,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
