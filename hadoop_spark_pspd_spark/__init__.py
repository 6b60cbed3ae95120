"""hadoop_spark_pspd_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``lipeaaraujo/hadoop-spark-pspd`` (a Hadoop MapReduce WordCount
lab + a Spark Structured Streaming windowed WordCount pipeline — see
SURVEY.md), re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured
Streaming) and extended with the relational + LLM-data-pipeline operator
surface required by the driver contract (TPC-H-ish star schema, dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
  session.py    — SparkSession factory (UTC, AQE, Arrow)
  catalog.py    — testdata table access + temp-view registration
  registry.py   — name -> (query fn, DuckDB oracle SQL) registry
  operators/    — query implementations (wordcount, relational, dedup,
                  similarity, text analysis, multimodal, streaming)
  functions/    — reusable column expressions (text, vectors, hashing)
  sources/      — readers/writers (text dir scan, TSV sink, parquet, JSONL)
  streaming/    — Kafka-shaped streaming wordcount, listeners
  plans/        — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
