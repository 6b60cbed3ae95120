"""Property-based tests (hypothesis) for the cross-engine parity rules.

Tokenizer parity is SURVEY §7.3's #1 risk: Spark split + empty-filter must
agree with DuckDB string_split_regex + empty-filter on arbitrary
whitespace-adversarial input, and both must match Java StringTokenizer
semantics (no empty tokens). Batched: hypothesis generates corpora, one
Spark job + one DuckDB query per corpus.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.functions.text import tokens

# printable-ish text with heavy whitespace adversity
_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ09._-") + [" ", "\t", "\n", "\r", "\x0b", "\x0c"]
    ),
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_text, min_size=1, max_size=20))
def test_tokenizer_parity_spark_vs_duckdb(spark, corpus):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)],
                               "id long, text string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokens(F.col("text")).alias("toks")).collect()
    }
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    exp = {
        r[0]: r[1]
        for r in con.sql(
            "SELECT id, list_filter(string_split_regex(text, '\\s+'),"
            " x -> x <> '') FROM docs"
        ).fetchall()
    }
    con.close()
    import re

    for i, s in enumerate(corpus):
        assert got[i] == exp[i], (repr(s), got[i], exp[i])
        # StringTokenizer semantics: no empty tokens, ever
        assert "" not in got[i]
        # reconstruction under the PINNED rule (not Python str.split, which
        # like Java \s treats \x0b as whitespace — the very divergence the
        # explicit class exists to avoid)
        ref = [t for t in re.split(r"[ \t\n\r\f]+", s) if t]
        assert got[i] == ref


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_decimal_sum_cross_engine_exact(spark, values):
    """The registry determinism rule itself, property-tested: DECIMAL(18,4)
    sums surfaced as double are bit-identical Spark vs DuckDB for
    arbitrary doubles (incl. the VARCHAR-hop on the DuckDB side)."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    s_val = df.agg(
        F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s")
    ).collect()[0]["s"]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    d_val = con.sql(
        "SELECT CAST(CAST(SUM(CAST(v AS DECIMAL(18,4))) AS VARCHAR)"
        " AS DOUBLE) FROM t"
    ).fetchone()[0]
    con.close()
    assert repr(s_val) == repr(d_val), (s_val, d_val)
