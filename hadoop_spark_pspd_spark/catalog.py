"""Testdata catalog: lazy parquet table access + temp-view registration.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import pin_session_conf


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to session-tz TIMESTAMP whatever the parquet
    writer emitted:

    * TIMESTAMP(NANOS) + nanosAsLong -> a long of epoch nanos.
      Floor-truncate to micros with *integer* division (epoch-ns exceeds
      double's 2^53 mantissa — float division would corrupt it), matching
      DuckDB's truncating ns->us read.
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ. Cast to
      TIMESTAMP: the session timezone is pinned to UTC (session.py), so the
      wall-clock reinterpretation is the identity on epoch values and
      unix_micros/watermarks (which reject NTZ) work downstream.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` reads the parquet.

    Reads are cached per instance so a query touching a table twice reuses
    one DataFrame (one scan node Catalyst can dedupe / push into).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        pin_session_conf(spark)
        self._spark = spark
        self._sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLES:
            raise AttributeError(f"unknown table {name!r}; known: {TABLES}")
        if name not in self._cache:
            df = self._spark.read.parquet(f"{self._sf_dir}/{name}.parquet")
            if name == "events":
                df = normalize_event_ts(df)
            self._cache[name] = df
        return self._cache[name]

    @property
    def sf_dir(self) -> str:
        return self._sf_dir

    def register_views(self, prefix: str = "") -> None:
        """Register every table as a temp view (for spark.sql queries)."""
        for name in TABLES:
            getattr(self, name).createOrReplaceTempView(prefix + name)
