"""SQL-API surface: LATERAL, Python UDTFs, recursive CTEs, SQL UDFs,
pipe syntax, collations.

Most engine queries declare plans through the DataFrame API; this module
exercises the other entry points a reference user would reach for:
ANSI LATERAL (Catalyst's DecorrelateInnerQuery path), Spark 4 Python
UDTFs (the sanctioned generator-UDF shape — Arrow-batched rows in,
iterator of rows out), WITH RECURSIVE, CREATE FUNCTION ... RETURN
(Catalyst-inlined SQL UDFs), the |> pipe-syntax query spelling, and
UTF8_LCASE collated grouping. The UDTF is deliberately a slow-path demo:
the engine's production tokenization stays in JVM higher-order functions
(functions/text.py); parity between the two is exactly what the shared
oracle checks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..catalog import Tables
from ..functions.text import WHITESPACE_RE
from ..registry import register


@register(
    "q_sql_lateral",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) top_orders
    """,
    doc="ANSI LATERAL: top-2 orders per customer via a correlated ordered-"
        "limit subquery — Catalyst decorrelates it into a ranked join "
        "(one shuffle), the SQL-standard spelling of topk-per-group.",
)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    return spark.sql("""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM pspd_customer,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM pspd_orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) top_orders
    """)


@udtf(returnType="bigram string")
class _BigramUdtf:
    """Word-bigram generator over one document's text.

    Tokenizer rule matches functions/text.py (explicit class, no empties)
    so the DuckDB oracle and the JVM tokenization agree on every input.
    """

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        toks = [w for w in re.split(WHITESPACE_RE, text or "") if w]
        for a, b in zip(toks, toks[1:]):
            yield (f"{a} {b}",)


@register(
    "q_udtf_bigrams",
    oracle="""
        SELECT bigram, count(*) AS n
        FROM (
            SELECT unnest(list_transform(
                       range(1, greatest(len(w), 1)),
                       i -> w[i] || ' ' || w[i+1])) AS bigram
            FROM (SELECT list_filter(
                             string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                             x -> x <> '') AS w
                  FROM documents)
        )
        GROUP BY bigram
    """,
    doc="Python UDTF (Spark 4): per-document word-bigram generation via a "
        "lateral UDTF call, then grouped counts. API-surface demo — the "
        "equivalent JVM expression is transform+slice as in dedup "
        "shingling, which is what production paths use.",
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    spark.udtf.register("pspd_bigrams", _BigramUdtf)
    return spark.sql("""
        SELECT bigram, count(*) AS n
        FROM pspd_documents, LATERAL pspd_bigrams(text)
        GROUP BY bigram
    """)


_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE chain(root, node, depth) AS (
        SELECT p_partkey, p_partkey, 0
        FROM {part} WHERE p_partkey % 2 = 1
        UNION ALL
        SELECT c.root, p.p_partkey, c.depth + 1
        FROM chain c JOIN {part} p ON p.p_partkey = c.node * 2
    ), per_root AS (
        SELECT root, CAST(max(depth) AS INTEGER) AS chain_len,
               count(*) AS n_nodes
        FROM chain GROUP BY root
    )
    SELECT chain_len, count(*) AS n_roots
    FROM per_root GROUP BY chain_len
"""


@register(
    "q_recursive_cte",
    oracle=_RECURSIVE_CHAIN_SQL.format(part="part"),
    doc="Spark 4 WITH RECURSIVE (iterative in-engine fixpoint, the "
        "operator family behind graph reachability / BOM explosion): "
        "doubling chains over part keys (node -> node*2 while present), "
        "rooted at odd keys, reduced to a chain-length distribution. "
        "IDENTICAL SQL text runs on both engines - only the view name "
        "differs. The engine's connected-components dedup (dedup_clusters) "
        "is the DataFrame-loop analog of the same fixpoint pattern.",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.part.createOrReplaceTempView("part_rcte")
    return spark.sql(_RECURSIVE_CHAIN_SQL.format(part="part_rcte"))


@register(
    "q_sql_udf",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))
                             * CAST(0.9 AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS discounted_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Spark 4 SQL-defined UDFs (CREATE FUNCTION ... RETURN expr): "
        "declarative scalar functions that Catalyst INLINES into the plan "
        "(no serialization boundary, full codegen - unlike Python UDFs). "
        "The oracle inlines the same expressions by hand, proving the "
        "UDF layer adds nothing semantically.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pspd_is_urgent(s STRING) "
        "RETURNS BOOLEAN RETURN s IN ('1-URGENT', '2-HIGH')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pspd_discounted(p DOUBLE) "
        "RETURNS DECIMAL(38,8) "
        "RETURN CAST(p AS DECIMAL(18,4)) * CAST(0.9 AS DECIMAL(18,4))"
    )
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN pspd_is_urgent(o_orderpriority)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               CAST(SUM(pspd_discounted(o_totalprice)) AS DOUBLE)
                   AS discounted_total
        FROM orders_sqludf
        GROUP BY o_orderpriority
    """)


@register(
    "q_sql_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS revenue
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
    """,
    doc="Spark 4 SQL pipe syntax (FROM ... |> WHERE ... |> AGGREGATE): "
        "the linear query spelling compiles to the identical logical plan "
        "as the classic SELECT — which is exactly what the plain-SQL "
        "oracle runs. Same decimal-sum determinism conventions.",
    tags=("sql",),
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders_pipe")
    return spark.sql("""
        FROM orders_pipe
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE) AS revenue
           GROUP BY o_orderpriority
    """)


@register(
    "q_collated_group",
    oracle="""
        SELECT lower(CASE WHEN user_id % 2 = 0 THEN upper(event_type)
                          ELSE event_type END) AS event_type_ci,
               count(*) AS n
        FROM events
        GROUP BY 1
    """,
    doc="Spark 4 collation support: grouping on a UTF8_LCASE-collated "
        "column folds case variants in the aggregate itself (no lower() "
        "rewrite in the engine plan — the collation travels with the "
        "type). A collated GROUP BY surfaces an arbitrary case "
        "representative, so the output key is lower()ed for determinism; "
        "the oracle states the equivalent lower() grouping. Case "
        "variance is synthesized (even user_ids uppercase their "
        "event_type) since the testdata is single-case.",
    tags=("sql",),
)
def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    mixed = F.when(
        F.col("user_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    return (
        t.events.select(F.collate(mixed, "UTF8_LCASE").alias("et"))
        .groupBy("et")
        .agg(F.count("*").alias("n"))
        .select(F.lower("et").alias("event_type_ci"), "n")
    )
