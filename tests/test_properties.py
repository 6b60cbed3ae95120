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


# --- as-of join: three physical strategies must agree on tie-heavy data ---

_SMALL_INT = st.integers(min_value=0, max_value=3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    events=st.lists(
        st.tuples(_SMALL_INT, _SMALL_INT), min_size=1, max_size=12
    ),
    orders=st.lists(
        st.tuples(_SMALL_INT, _SMALL_INT), min_size=1, max_size=12
    ),
)
def test_asof_join_strategies_agree(spark, tmp_path_factory, events, orders):
    """union+window, join+max_by and cogrouped merge_asof are three
    independent implementations of one operator; generated keys/timestamps
    collide on purpose so the (o_orderdate, o_orderkey) tie-break is
    actually exercised (the testdata tables have no such ties)."""
    import pandas as pd

    from hadoop_spark_pspd_spark.operators.advanced import (
        q_asof_join,
        q_asof_join_maxby,
        q_asof_join_pandas,
    )

    sf = str(tmp_path_factory.mktemp("asof"))
    ev = pd.DataFrame(
        {
            "event_id": range(len(events)),
            "user_id": [u for u, _ in events],
            "ts": pd.to_datetime([d for _, d in events], unit="D", utc=False),
            "event_type": "x",
            "value": 0.0,
            "props": "{}",
        }
    )
    # match the real events table's TIMESTAMP(NANOS) physical type so
    # catalog.normalize_event_ts applies the same nanosAsLong read path
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(ev)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        pa.field("ts", pa.timestamp("ns")),
        tbl["ts"].cast(pa.timestamp("ns")),
    )
    pq.write_table(tbl, f"{sf}/events.parquet", use_deprecated_int96_timestamps=False)
    od = pd.DataFrame(
        {
            "o_orderkey": range(len(orders)),
            "o_custkey": [u for u, _ in orders],
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.to_datetime(
                [d for _, d in orders], unit="D", utc=False
            ),
            "o_orderpriority": "1-URGENT",
        }
    )
    # microsecond precision: the engine session reads ns-typed parquet
    # columns as long (nanosAsLong, events-specific), so orders must carry
    # the us timestamps the real table has
    od.to_parquet(
        f"{sf}/orders.parquet", coerce_timestamps="us", engine="pyarrow"
    )

    a = q_asof_join(spark, sf).collect()
    b = q_asof_join_maxby(spark, sf).collect()
    c = q_asof_join_pandas(spark, sf).collect()
    key = lambda r: (r.event_id, r.user_id, r.ts)  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(map(tuple, a)) == sorted(map(tuple, c))


# q21-shape equivalence: the windowed single-pass collapse must equal the
# textbook EXISTS/NOT-EXISTS double self-join on adversarial order shapes
# (single-supplier orders, all-late orders, ties where one supplier is
# late twice in the same order).
_li_row = st.tuples(
    st.integers(min_value=1, max_value=6),   # orderkey
    st.integers(min_value=1, max_value=4),   # suppkey
    st.integers(min_value=0, max_value=120), # ship lag days
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_li_row, min_size=1, max_size=30))
def test_q21_window_collapse_equals_exists_formulation(spark, rows):
    from pyspark.sql import Window

    li = spark.createDataFrame(
        [
            (ok, sk, f"2024-01-{1 + lag % 28:02d}", lag > 60)
            for ok, sk, lag in rows
        ],
        "l_orderkey long, l_suppkey long, ship string, is_late boolean",
    )

    # formulation A: window distinct-counts (the engine's plan)
    w = Window.partitionBy("l_orderkey")
    a = (
        li.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late")
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .groupBy("l_suppkey")
        .count()
    )

    # formulation B: textbook EXISTS (semi) + NOT EXISTS (anti) self-joins
    other = li.select(
        F.col("l_orderkey").alias("ok2"),
        F.col("l_suppkey").alias("sk2"),
        F.col("is_late").alias("late2"),
    )
    b = (
        li.filter("is_late")
        .join(
            other,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            other.filter("late2"),
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .count()
    )

    got = sorted(map(tuple, a.collect()))
    exp = sorted(map(tuple, b.collect()))
    assert got == exp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("ab1")), min_size=0,
                max_size=6),
        min_size=2,
        max_size=25,
        unique=True,
    )
)
def test_fastss_blocking_is_complete(spark, names):
    """FastSS completeness on adversarial short strings: every pair
    within levenshtein distance 1 must be found by the
    deletion-neighborhood equi-join — compare against the brute-force
    O(n^2) python answer."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    col = F.col("n")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1), col.substr(i + 1, F.length(col))
        ),
    )
    vars_df = df.select(
        "k", "n", F.explode(F.array_append(dels, col)).alias("v")
    )
    a, b = vars_df.alias("a"), vars_df.alias("b")
    got = {
        (r["ka"], r["kb"])
        for r in a.join(
            b,
            (F.col("a.v") == F.col("b.v")) & (F.col("a.k") < F.col("b.k")),
        )
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"),
                F.levenshtein("a.n", "b.n").alias("d"))
        .where(F.col("d") <= 1)
        .distinct()
        .collect()
    }

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    want = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 20) - 1),
            st.integers(min_value=0, max_value=(1 << 20) - 1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_zorder_key_matches_python_morton(spark, pairs):
    """The SQL Morton interleave equals the reference python bit
    interleave of the low 16 bits (values above 16 bits are masked,
    never folded)."""
    from hadoop_spark_pspd_spark.operators.bucketing import (
        ZBITS,
        zorder_key,
    )

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)],
        "id long, x long, y long",
    )
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_key("x", "y").alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(ZBITS):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        return z

    for i, (x, y) in enumerate(pairs):
        assert got[i] == morton(x & 0xFFFF, y & 0xFFFF), (x, y)


def test_hll_and_kmv_track_exact_distinct(spark):
    """approx_count_distinct (HLL++, the production at-scale path) and
    the oracled KMV sketch (q_approx_distinct) both land within 15% of
    the exact distinct count at sf0.001 — the HLL API surface stays
    exercised even though the registered query emits the cross-engine-
    deterministic KMV estimate instead of the engine-specific HLL binary."""
    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.functions_coverage import (
        q_approx_distinct,
    )
    from conftest import SF_SMOKE

    t = Tables(spark, SF_SMOKE)
    hll = {
        r["l_returnflag"]: (r["hll_parts"], r["exact_parts"])
        for r in t.lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("hll_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .collect()
    }
    for flag, (approx, exact) in hll.items():
        assert abs(approx - exact) <= 0.15 * exact, (flag, approx, exact)
    kmv = {r["l_returnflag"]: r for r in q_approx_distinct(spark, SF_SMOKE).collect()}
    for flag, r in kmv.items():
        assert r["exact_parts"] == hll[flag][1], flag
        assert abs(r["kmv_parts"] - r["exact_parts"]) <= 0.3 * r["exact_parts"], flag
