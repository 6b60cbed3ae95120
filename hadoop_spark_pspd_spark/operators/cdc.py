"""Content-defined chunking + sketch-based cross-source overlap.

Two scale-path curation operators the reference's corpus tooling
(``/root/reference/cluster/tools/generate_wordcount_data.sh``,
``download_gutenberg_corpus.sh``) motivates but never had: sub-document
duplicate detection via Rabin-style content-defined chunking (FastCDC /
LBFS lineage), and a KMV theta-sketch estimate of cross-source content
overlap (the mergeable-sketch alternative to an exact distinct join).

Cross-engine discipline (CLAUDE.md): all content is BYTE-defined through
the ``hex(encode(text))`` representation (char semantics diverge on
non-ASCII); hashes are md5-derived integers via the proven
``conv(substr(md5(x),1,13),16,10)`` == ``CAST('0x'||... AS UBIGINT)``
bridge; the only doubles emitted are single correctly-rounded divisions
of exact integers; every DuckDB aggregate is outer-CAST to BIGINT so no
HUGEINT reaches the driver's pandas canonicalizer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

# Rolling-hash chunking parameters. Window W bytes, polynomial base B,
# a boundary wherever the windowed hash is 0 mod D (expected chunk ~D
# bytes plus the window).  All integer arithmetic stays < 2^63:
# max term 255 * 31^7 ~ 7.0e12, eight-term sum < 5.7e13.
_CDC_W = 8
_CDC_B = 31
_CDC_D = 64
_CDC_POW = [_CDC_B**j for j in range(_CDC_W)]

_CDC_CHUNK_SCHEMA = "source string, fp string, len long"


def _cdc_chunk_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: docs in, one row per chunk out.

    Linear in corpus bytes, zero shuffle, no per-byte row explosion —
    the 100 TB path. numpy int64 arithmetic is exact, so the boundary
    set is bit-identical to the oracle's relational lag-window replay.
    """
    import numpy as np

    for pdf in batches:
        out_src: list[str] = []
        out_fp: list[str] = []
        out_len: list[int] = []
        for source, text in zip(pdf["source"], pdf["text"]):
            b = text.encode("utf-8")
            n = len(b)
            if n < 1:
                continue
            hx = b.hex().upper()
            if n <= _CDC_W:
                # no position satisfies W <= p <= n-1: one chunk, and
                # the n-j slice below would wrap negatively anyway
                cuts: list[int] = []
            else:
                vals = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                h = np.zeros(n, dtype=np.int64)
                for j, p in enumerate(_CDC_POW):
                    h[_CDC_W - 1 :] += p * vals[_CDC_W - 1 - j : n - j]
                # 1-based boundary positions p in [W, n-1]
                cuts = (
                    np.nonzero(h[_CDC_W - 1 : n - 1] % _CDC_D == 0)[0]
                    + _CDC_W
                ).tolist()
            starts = [1] + [p + 1 for p in cuts]
            ends = cuts + [n]
            for s, e in zip(starts, ends):
                sub = hx[2 * (s - 1) : 2 * e]
                out_src.append(source)
                out_fp.append(hashlib.md5(sub.encode("ascii")).hexdigest())
                out_len.append(e - s + 1)
        yield pd.DataFrame(
            {"source": out_src, "fp": out_fp, "len": out_len}
        )


def _cdc_oracle() -> str:
    poly = " + ".join(
        f"{_CDC_POW[j]} * lag(val, {j}) OVER w" if j else "val"
        for j in range(_CDC_W)
    )
    return f"""
        WITH d AS (
            SELECT doc_id, source, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= 1
        ), pos AS (
            SELECT doc_id, CAST(unnest(range(1, n + 1)) AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id, p.pos, d.n,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) AS val
            FROM pos p JOIN d USING (doc_id)
        ), h AS (
            SELECT doc_id, pos, n, {poly} AS h
            FROM v WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), cuts AS (
            SELECT doc_id, pos AS e FROM h
            WHERE pos >= {_CDC_W} AND pos < n AND h % {_CDC_D} = 0
            UNION ALL SELECT doc_id, n AS e FROM d
        ), spans AS (
            SELECT doc_id,
                   COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e),
                            0) + 1 AS s,
                   e
            FROM cuts
        ), chunks AS (
            SELECT d.source,
                   md5(substr(d.hx, CAST(2 * sp.s - 1 AS INTEGER),
                              CAST(2 * (sp.e - sp.s + 1) AS INTEGER)))
                       AS fp,
                   sp.e - sp.s + 1 AS len
            FROM spans sp JOIN d USING (doc_id)
        ), per_fp AS (
            SELECT source, fp, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(MAX(len) AS BIGINT) AS len
            FROM chunks GROUP BY source, fp
        )
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
               CAST(SUM(c * len) AS BIGINT) AS total_bytes,
               CAST(SUM(len) AS BIGINT) AS distinct_bytes,
               CAST(CAST(SUM(c * len) - SUM(len) AS BIGINT) AS DOUBLE)
                   / CAST(CASE WHEN SUM(c * len) = 0 THEN 1
                               ELSE SUM(c * len) END AS BIGINT)
                   AS dup_fraction
        FROM per_fp GROUP BY source
    """


@register(
    "text_cdc_chunks",
    oracle=_cdc_oracle(),
    doc="Content-defined chunking (Rabin/FastCDC-style): every document "
        "is split at positions where an 8-byte polynomial rolling hash "
        "is 0 mod 64, so chunk boundaries move with CONTENT, not "
        "offsets — an insertion early in a page re-aligns at the next "
        "boundary and every later chunk still dedups (the property "
        "fixed-size chunking lacks). Per source: chunk counts, distinct "
        "chunks by md5 fingerprint, and the byte-level duplicate "
        "fraction. Spark side is a single linear mapInPandas numpy scan "
        "(no per-byte rows, no shuffle before the (source,fp) agg) — "
        "the 100 TB path; the oracle replays the identical boundary set "
        "relationally via an 8-term lag-window polynomial. All "
        "arithmetic is exact int64; the one double is "
        "dup_bytes/total_bytes with an identical zero-guard both sides.",
    bench=True,
    tags=("text", "dedup"),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    docs = t.documents.select("source", "text").filter(
        F.octet_length("text") >= 1
    )
    chunks = docs.mapInPandas(_cdc_chunk_batches, _CDC_CHUNK_SCHEMA)
    per_fp = chunks.groupBy("source", "fp").agg(
        F.count("*").cast("bigint").alias("c"),
        F.max("len").cast("bigint").alias("len"),
    )
    total = F.sum(F.col("c") * F.col("len")).cast("bigint")
    distinct = F.sum("len").cast("bigint")
    return per_fp.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_chunks"),
        F.count("*").cast("bigint").alias("n_distinct_chunks"),
        total.alias("total_bytes"),
        distinct.alias("distinct_bytes"),
        (
            (total - distinct).cast("double")
            / F.when(total == 0, F.lit(1).cast("bigint")).otherwise(total)
        ).alias("dup_fraction"),
    )


# KMV theta sketch: k minimum 52-bit md5-derived hash values per source
# over distinct 8-byte shingles; intersection estimated below the pair's
# min theta.  est = common * 2^52 / theta_min is exact-int double math:
# common <= 63 so common*2^52 is exactly representable, theta_min < 2^53,
# one correctly-rounded division.
_KMV_K = 64
_T52 = 1 << 52


@register(
    "sketch_theta_kmv",
    oracle=f"""
        WITH d AS (
            SELECT source, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= 8
        ), su AS (
            SELECT source, hx, CAST(unnest(range(1, n - 6)) AS BIGINT) AS i
            FROM d
        ), sh AS (
            SELECT DISTINCT source,
                   substr(hx, CAST(2 * i - 1 AS INTEGER), 16) AS shingle
            FROM su
        ), hashed AS (
            SELECT source, shingle,
                   CAST(CAST(('0x' || substr(md5(shingle), 1, 13))
                        AS UBIGINT) AS BIGINT) AS h
            FROM sh
        ), ranked AS (
            SELECT source, shingle, h,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY h, shingle) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
                       AS n_src
            FROM hashed
        ), theta AS (
            SELECT source,
                   CASE WHEN max(n_src) >= {_KMV_K}
                        THEN max(CASE WHEN rn = {_KMV_K} THEN h END)
                        ELSE {_T52} END AS theta_h
            FROM ranked GROUP BY source
        ), sk AS (
            SELECT r.source, r.h
            FROM ranked r JOIN theta t USING (source)
            WHERE r.rn < {_KMV_K} AND r.h < t.theta_h
        ), pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CASE WHEN a.theta_h < b.theta_h THEN a.theta_h
                        ELSE b.theta_h END AS theta_min
            FROM theta a JOIN theta b ON a.source < b.source
        ), common AS (
            SELECT sa.source AS source_a, sb.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS sk_common
            FROM sk sa
            JOIN sk sb ON sb.h = sa.h AND sa.source < sb.source
            JOIN pairs p ON p.source_a = sa.source
                        AND p.source_b = sb.source
                        AND sa.h < p.theta_min
            GROUP BY 1, 2
        ), truth AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS true_common
            FROM sh a
            JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.source_a, p.source_b,
               CAST(COALESCE(c.sk_common, 0) AS BIGINT) AS sk_common,
               CAST(p.theta_min AS BIGINT) AS theta_min,
               CAST(COALESCE(c.sk_common, 0) AS DOUBLE) * {_T52}
                   / CAST(CASE WHEN p.theta_min = 0 THEN 1
                               ELSE p.theta_min END AS DOUBLE)
                   AS est_common,
               CAST(COALESCE(t.true_common, 0) AS BIGINT) AS true_common
        FROM pairs p
        LEFT JOIN common c USING (source_a, source_b)
        LEFT JOIN truth t USING (source_a, source_b)
        ORDER BY source_a, source_b
    """,
    doc="KMV theta-sketch estimate of cross-source content overlap: "
        "per source, keep the 63 smallest 52-bit md5 hashes of its "
        "distinct 8-byte shingles (theta = 64th smallest); a pair's "
        "shared-shingle count is estimated from sketch-hash matches "
        "below min(theta_a, theta_b) scaled by 2^52/theta_min — the "
        "mergeable O(k)-per-source alternative to the exact distinct "
        "join (also emitted, as true_common, for accuracy eval). "
        "Sketch hashes are md5-derandomized (CLAUDE.md bridge), the "
        "estimate is exact-int double math, sources with < k shingles "
        "degrade to exact mode via theta = 2^52. At 100 TB the sketch "
        "side is one linear scan + a k-row-per-source state; only the "
        "eval column needs the full distinct join and would be dropped "
        "in production.",
    tags=("sketch", "dedup"),
)
def sketch_theta_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    # pre-explosion repartition (the dedup.shingles_exploded rationale):
    # a small parquet arrives as ONE split and the per-byte shingle
    # explode is CPU-bound — measured 3.3 s -> 0.6 s on that stage alone
    d = (
        t.documents.filter(F.octet_length("text") >= 8)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "source",
            F.hex(F.encode("text", "utf-8")).alias("hx"),
            F.octet_length("text").cast("bigint").alias("n"),
        )
    )
    sh = (
        d.select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - 7),
                    lambda i: F.substring("hx", i * 2 - 1, F.lit(16)),
                )
            ).alias("shingle"),
        )
        .distinct()
        # two consumers (sketch side, true_common eval) — unpinned, the
        # per-byte explode+distinct re-ran per consumer (the before-plan
        # carried 30 parquet scans / 57 exchanges for this one query)
        .localCheckpoint(eager=False)
    )
    hashed = sh.select(
        "source",
        "shingle",
        F.conv(F.substring(F.md5("shingle"), 1, 13), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # two-level k-smallest (the q_approx_distinct pattern): one window
    # per source sorts that source's whole distinct set on ONE task;
    # instead rank within (source, h%64) salt partitions — the global
    # top-k are necessarily within their salt's top-k — then rank the
    # <= 64*k survivors. Identical output, 64x the sort parallelism.
    w_salt = W.partitionBy("source", F.pmod("h", F.lit(_KMV_K))).orderBy(
        "h", "shingle"
    )
    survivors = (
        hashed.withColumn("rs", F.row_number().over(w_salt))
        .filter(F.col("rs") <= _KMV_K)
        .drop("rs")
    )
    w_rank = W.partitionBy("source").orderBy("h", "shingle")
    # ranked: 2 consumers (theta, sk); theta: 3 (sk, both pair sides) —
    # pin both so the salted two-level rank runs once
    ranked = survivors.select(
        "source", "h", F.row_number().over(w_rank).alias("rn")
    ).localCheckpoint(eager=False)
    n_src = hashed.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_src")
    )
    theta = (
        ranked.groupBy("source")
        .agg(F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"))
        .join(n_src, "source")
        .select(
            "source",
            F.when(F.col("n_src") >= _KMV_K, F.col("kth"))
            .otherwise(F.lit(_T52).cast("long"))
            .alias("theta_h"),
        )
        .localCheckpoint(eager=False)
    )
    sk = (
        ranked.filter(F.col("rn") < _KMV_K)
        .join(theta, "source")
        .filter(F.col("h") < F.col("theta_h"))
        .select("source", "h")
        # 2 consumers (both sides of the sketch-match self-join)
        .localCheckpoint(eager=False)
    )
    ta = theta.select(
        F.col("source").alias("source_a"), F.col("theta_h").alias("th_a")
    )
    tb = theta.select(
        F.col("source").alias("source_b"), F.col("theta_h").alias("th_b")
    )
    pairs = (
        ta.join(tb, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.when(F.col("th_a") < F.col("th_b"), F.col("th_a"))
            .otherwise(F.col("th_b"))
            .alias("theta_min"),
        )
    )
    sa = sk.select(F.col("source").alias("source_a"), "h")
    sb = sk.select(F.col("source").alias("source_b"), F.col("h").alias("hb"))
    common = (
        sa.join(
            sb,
            (F.col("hb") == F.col("h"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .join(pairs, ["source_a", "source_b"])
        .filter(F.col("h") < F.col("theta_min"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("sk_common"))
    )
    # true_common eval: ONE grouped pass over the cached distinct set
    # (collect_set of the <=20 sources per shingle, explode the a<b
    # pairs) instead of a shingle-keyed self-join — halves the shuffle
    # and skips the join build. Identical pair counts.
    srcs = F.array_sort(F.collect_set("source"))
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("srcs"),
                lambda a: F.transform(
                    F.col("srcs"),
                    lambda b: F.struct(
                        a.alias("source_a"), b.alias("source_b")
                    ),
                ),
            )
        ),
        lambda p: p["source_a"] < p["source_b"],
    )
    truth = (
        sh.groupBy("shingle")
        .agg(srcs.alias("srcs"))
        .filter(F.size("srcs") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("true_common"))
    )
    skc = F.coalesce(F.col("sk_common"), F.lit(0).cast("bigint"))
    return (
        pairs.join(common, ["source_a", "source_b"], "left")
        .join(truth, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            skc.alias("sk_common"),
            F.col("theta_min").cast("bigint").alias("theta_min"),
            (
                skc.cast("double")
                * F.lit(float(_T52))
                / F.when(F.col("theta_min") == 0, F.lit(1).cast("bigint"))
                .otherwise(F.col("theta_min"))
                .cast("double")
            ).alias("est_common"),
            F.coalesce(F.col("true_common"), F.lit(0).cast("bigint")).alias(
                "true_common"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# HyperLogLog with explicit registers (Flajolet et al. 2007, public
# algorithm). The classic mergeable cardinality sketch, fully
# derandomized through the md5-52-bit bridge so the register table —
# not just the estimate — hash-matches the oracle. b = 8 -> m = 256
# registers; the remaining 44 hash bits feed the leading-zero rank.

_HLL_B = 8
_HLL_M = 1 << _HLL_B  # 256 registers
_HLL_WBITS = 52 - _HLL_B  # 44 rank bits
# alpha_m * m^2 computed ONCE here and embedded as the same double
# literal in both engines (transcendental-constant rule, round-6 #3)
_HLL_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M)

# rho(w) = leading zeros of the 44-bit word + 1, as a pure integer
# CASE ladder shared VERBATIM by Spark and DuckDB (no log2 anywhere):
# rho = r iff w >= 2^(44-r) first fires at r; w = 0 -> 45.
_HLL_RHO_CASE = "CASE " + " ".join(
    f"WHEN w >= {1 << (_HLL_WBITS - r)} THEN {r}"
    for r in range(1, _HLL_WBITS + 1)
) + f" ELSE {_HLL_WBITS + 1} END"


@register(
    "sketch_hll_registers",
    oracle=f"""
        WITH h AS (
            SELECT CAST(CAST(('0x' || substr(md5(
                       CAST(l_partkey AS VARCHAR)), 1, 13)) AS UBIGINT)
                       AS BIGINT) AS h
            FROM lineitem
        ), rw AS (
            SELECT h % {_HLL_M} AS j, h // {_HLL_M} AS w FROM h
        ), regs AS (
            SELECT j, max({_HLL_RHO_CASE}) AS m_j
            FROM rw GROUP BY j
        ), grid AS (
            SELECT CAST(unnest(range(0, {_HLL_M})) AS BIGINT) AS j
        ), full_regs AS (
            SELECT g.j,
                   CAST(coalesce(r.m_j, 0) AS BIGINT) AS m_j
            FROM grid g LEFT JOIN regs r ON g.j = r.j
        ), summary AS (
            SELECT CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v_empty,
                   SUM(CAST(1 AS DOUBLE)
                       / CAST(CAST(1 AS BIGINT) << m_j AS DOUBLE)) AS z_sum
            FROM full_regs
        ), exact AS (
            SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
            FROM lineitem
        )
        SELECT f.j, f.m_j, s.v_empty, s.z_sum,
               CAST('{_HLL_ALPHA_M2}' AS DOUBLE) / s.z_sum AS hll_est,
               e.n_exact
        FROM full_regs f CROSS JOIN summary s CROSS JOIN exact e
    """,
    doc="HyperLogLog cardinality sketch with EXPLICIT registers "
        "(Flajolet, Fusy, Gandouet & Meunier 2007, public): 52-bit md5 "
        "hashes of l_partkey split into an 8-bit register index and a "
        "44-bit rank word; rho = leading zeros + 1 via a pure integer "
        "CASE ladder shared verbatim by both engines (no log2); "
        "registers are max-merged (idempotent — no distinct needed "
        "upstream, the property that makes HLL one-pass mergeable at "
        "100 TB). The harmonic sum's terms 2^-M_j are dyadic rationals "
        "on the common denominator 2^45 with numerator sum < 2^53, so "
        "the double sum is EXACT and order-free; alpha_m*m^2 is one "
        "Python-computed literal and the estimate is a single "
        "correctly-rounded division. Emits the 256-row register table "
        "(merge-able state, the real production artifact) plus the raw "
        "estimate and the exact distinct count for accuracy eval. "
        "Spark plan: map-side partial max -> 256-group shuffle; the "
        "empty-register grid joins broadcast.",
    tags=("sketch",),
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    h = t.lineitem.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 13),
               16, 10)
        .cast("long")
        .alias("h")
    )
    rw = h.select(
        (F.col("h") % _HLL_M).alias("j"),
        F.expr(f"h div {_HLL_M}").alias("w"),
    )
    regs = rw.groupBy("j").agg(
        F.max(F.expr(_HLL_RHO_CASE)).alias("m_j_raw")
    )
    grid = spark.range(_HLL_M).select(F.col("id").alias("j"))
    full_regs = grid.join(F.broadcast(regs), "j", "left").select(
        "j", F.coalesce(F.col("m_j_raw"), F.lit(0)).cast("bigint").alias("m_j")
    )
    summary = full_regs.agg(
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_empty"),
        F.sum(
            F.expr(
                "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), "
                "CAST(m_j AS INT)) AS DOUBLE)"
            )
        ).alias("z_sum"),
    )
    exact = t.lineitem.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_exact")
    )
    return (
        full_regs.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(exact))
        .select(
            "j", "m_j", "v_empty", "z_sum",
            (F.lit(float(_HLL_ALPHA_M2)) / F.col("z_sum")).alias("hll_est"),
            "n_exact",
        )
    )
