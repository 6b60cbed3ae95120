"""Simulated-sf1 scale bench + AQE skew-join demonstration.

Answers the 100 TB question empirically at the largest scale this box
holds: replicate every sf0.1 table 10x with disjoint key spaces (each
copy's ids get a +k*10M offset, so per-copy referential integrity and
join selectivity are preserved — ~600k orders / 2.4M lineitem / 50k
docs), run the full headline bench suite on both scales, and report the
wall-clock growth ratio per query. A plan whose wall grows ~linearly
(ratio ~<=10x on 10x data, modulo fixed floors) has no hidden
quadratic/shuffle blow-up; known exceptions are documented in
BENCH_NOTES.md (near-dup pair OUTPUT is quadratic in the duplication
factor by data semantics).

Also runs a deliberately skewed fact-fact join (90% of a 1M-row fact on
ONE key) with AQE skew-join splitting on vs off, printing wall times and
whether the plan reports skew=true partitions split.

Usage: python tools/scale_bench.py [--skew-only|--scale-only]
                                   [--queries a,b,c] [--rebuild]
The simulated-sf1 dir carries a _MARKER.json (source mtimes/sizes +
replication settings); it is rebuilt automatically when stale.
Writes one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_spark_pspd_spark.catalog import TABLES  # noqa: E402
from hadoop_spark_pspd_spark.registry import load_all  # noqa: E402
from hadoop_spark_pspd_spark.session import get_spark  # noqa: E402

SF_BASE = "/root/testdata/sf0.1"
COPIES = 10  # overridden by --copies (100 = the round-9 100x protocol)
OFFSET = 10_000_000


def sim_dir() -> str:
    # legacy name for the plain 10x replica so existing markers stay valid
    if COPIES == 10 and not SALT:
        return "/tmp/pspd_sim_sf1"
    return f"/tmp/pspd_sim_{COPIES}x" + ("_salted" if SALT else "")

# id columns to shift per copy so each replica is a disjoint consistent
# universe (joins match within a copy, never across)
KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _sim_signature() -> str:
    """Fingerprint of what SIM_DIR should have been built from: source
    table mtimes+sizes plus the replication settings. A pre-existing
    SIM_DIR built from different testdata (or a different COPIES/OFFSET)
    would silently produce wrong 10x ratios — the marker forces a rebuild
    instead."""
    mt = {}
    for t in TABLES:
        p = Path(f"{SF_BASE}/{t}.parquet")
        st = p.stat()
        mt[t] = [int(st.st_mtime), st.st_size]
    return json.dumps(
        {"copies": COPIES, "offset": OFFSET, "base": SF_BASE, "src": mt,
         "salt": SALT},
        sort_keys=True,
    )


SALT = False  # --salt: per-copy content transform (see _salt_copy)


def _salt_copy(table: str, c, k: int):
    """Per-copy CONTENT salting for corpus-growth modeling (--salt).

    Pure replication models '100 identical crawls': every replicated
    doc/vector is an exact near-dup of its 99 twins, so near-dup pair
    OUTPUT grows quadratically in the copy count — at 100x that measures
    output explosion, not plan behavior (the 10x tables document the
    caveat per query). Salting keeps WITHIN-copy structure exactly while
    making cross-copy content disjoint:

      * documents: every whitespace token gets a per-copy suffix, so no
        shingle/window fingerprint matches across copies while the
        per-copy shingle-set relationships (and so every Jaccard) are
        preserved; n_chars is recomputed.
      * embeddings: a per-copy SIGNED PERMUTATION of the 64 dims — an
        orthogonal map, so every within-copy cosine is bit-identically
        preserved (reorder + exact sign flip), while cross-copy cosines
        of formerly-identical vectors decorrelate to ~N(0, 1/sqrt(d)).

    Copy 0 stays untransformed so per-copy structure equals the base.
    """
    if not SALT or k == 0:
        return c
    if table == "documents":
        c = c.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{k}")
        )
        return c.withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        import random

        rng = random.Random(1000 + k)
        perm = list(range(64))
        rng.shuffle(perm)
        signs = [rng.choice((-1.0, 1.0)) for _ in range(64)]
        return c.withColumn(
            "embedding",
            F.array(
                *[
                    (F.col("embedding")[perm[i]] * F.lit(signs[i])).cast(
                        "float"
                    )
                    for i in range(64)
                ]
            ),
        )
    return c


def build_sim_sf1(spark) -> None:
    shutil.rmtree(sim_dir(), ignore_errors=True)
    Path(sim_dir()).mkdir(parents=True)
    # events.ts is TIMESTAMP(NANOS): read as long (engine convention,
    # catalog.normalize_event_ts); the replica stores plain INT64 nanos
    # which the same read path handles identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table in TABLES:
        src = spark.read.parquet(f"{SF_BASE}/{table}.parquet")
        copies = []
        for k in range(COPIES):
            c = src
            for col in KEY_COLS[table]:
                c = c.withColumn(col, F.col(col) + F.lit(k * OFFSET))
            copies.append(_salt_copy(table, c, k))
        # append in batches of 10 so a --copies 100 build keeps plans
        # shallow (100 salted union branches is a needlessly deep tree)
        dest = f"{sim_dir()}/{table}.parquet"
        for b in range(0, len(copies), 10):
            out = copies[b]
            for c in copies[b + 1 : b + 10]:
                out = out.unionAll(c)
            out.write.mode("overwrite" if b == 0 else "append").parquet(dest)
    (Path(sim_dir()) / "_MARKER.json").write_text(_sim_signature())
    print(f"# built {sim_dir()} ({COPIES}x {SF_BASE})", file=sys.stderr)


def run_suite(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, float]:
    reg = load_all()
    if names is None:
        names = [n for n, q in sorted(reg.items()) if q.bench]
    # same warmup as bench.py: file index + HOF-lambda Catalyst classes,
    # so the alphabetically-first query doesn't absorb session cold cost
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(1).select(
        F.filter(F.array(F.lit("a")), lambda x: x != F.lit("")),
        F.transform(F.sequence(F.lit(0), F.lit(1)), lambda i: i + 1),
    ).collect()
    timings = {}
    for name in names:
        t0 = time.time()
        df = reg[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        print(f"# {sf_dir} {name}: {timings[name]}s", file=sys.stderr)
    return timings


def skew_demo(spark) -> dict:
    """20M-row fact with 90% of rows on one key joined to a 100k-row dim:
    AQE skew-join must split the hot partition; measure on vs off."""
    fact = spark.range(0, 20_000_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 100_000).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("name")
    )
    results = {}
    for skew_on in (True, False):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # keep the join a shuffle join (skew handling targets SMJ/SHJ)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # force the skewed side over the split thresholds at this scale
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        t0 = time.time()
        joined = fact.join(dim, "k").groupBy().agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )
        row = joined.collect()[0]
        wall = round(time.time() - t0, 2)
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        results["skew_on" if skew_on else "skew_off"] = {
            "wall_sec": wall,
            "skew_split_in_plan": "skew=true" in plan,
            "rows": int(row["n"]),
        }
        print(f"# skewJoin={skew_on}: {wall}s skew_split="
              f"{'skew=true' in plan}", file=sys.stderr)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    return results


def neardup_uniform_demo(
    spark, sizes=(2000, 20000), semantic: bool = False,
    dim: int | None = None,
) -> dict:
    """The exact-recall worst case, measured: ADVERSARIALLY UNIFORM unit
    vectors (no cluster structure, so no cell pair prunes and the blocked
    numpy screen must compare every block pair) at n=2000 and n=20000.
    The screen materializes ~0 candidate rows (uniform d=64 cosines
    concentrate at 0 +- 1/8, far below 0.4), so wall = fixed plan
    overhead + dense-matmul screen flops; the 10x ratio shows how much of
    the quadratic is hidden under matmul rate + fixed floors at this
    scale. Planted near-dup pairs keep the output non-trivial and pin
    recall under the degraded path."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.similarity import (
        DIM,
        sim_embedding_neardup,
    )

    if dim is None:
        dim = DIM
    rng = np.random.default_rng(11)
    results = {"dim": dim}
    walls = {}
    for n in sizes:
        base = rng.standard_normal((n, dim))
        # planted near-dups scale LINEARLY with n (16 per 2000 vectors),
        # so output growth at any size ratio is linear by construction —
        # the real-embedding regime (high dim / high threshold: O(1)
        # near-dups per doc), which the clustered d=64/0.4 testdata
        # cannot model past ~10x (cross-copy cosine tails leak pairs)
        planted = max(16, 16 * n // 2000)
        for k in range(planted):
            base[n - planted + k] = base[k % (n - planted)] + (
                0.05 * rng.standard_normal(dim)
            )
        unit = (base / np.linalg.norm(base, axis=1, keepdims=True)).astype(
            np.float32
        )
        sf_dir = f"/tmp/pspd_uniform_{dim}_{n}" if dim != DIM else (
            f"/tmp/pspd_uniform_{n}"
        )
        # pyarrow direct write: 200k x 768 floats through
        # createDataFrame's row pickling takes minutes; arrow seconds
        import pyarrow as pa
        import pyarrow.parquet as pq

        out_dir = Path(f"{sf_dir}/embeddings.parquet")
        shutil.rmtree(out_dir, ignore_errors=True)
        out_dir.mkdir(parents=True, exist_ok=True)
        n_files = max(8, n // 10000)
        bounds = [n * i // n_files for i in range(n_files + 1)]
        for f in range(n_files):
            lo, hi = bounds[f], bounds[f + 1]
            tbl = pa.table(
                {
                    "vec_id": pa.array(range(lo, hi), pa.int64()),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(
                            unit[lo:hi].reshape(-1), pa.float32()
                        ),
                        dim,
                    ).cast(pa.list_(pa.float32())),
                    "label": pa.array([0] * (hi - lo), pa.int32()),
                }
            )
            pq.write_table(tbl, out_dir / f"part-{f:05d}.parquet")
        t0 = time.time()
        rows = sim_embedding_neardup(spark, sf_dir).count()
        wall = round(time.time() - t0, 2)
        walls[n] = wall
        results[f"n{n}"] = {"wall_sec": wall, "pairs": int(rows)}
        spark.catalog.clearCache()
        print(f"# neardup uniform n={n}: {wall}s {rows} pairs",
              file=sys.stderr)
        if semantic:
            from hadoop_spark_pspd_spark.registry import load_all

            t0 = time.time()
            nrows = load_all()["sim_semantic_dedup"].fn(spark, sf_dir).count()
            wall = round(time.time() - t0, 2)
            results[f"n{n}"]["semantic_wall_sec"] = wall
            results[f"n{n}"]["semantic_rows"] = int(nrows)
            spark.catalog.clearCache()
            print(f"# semantic_dedup uniform n={n}: {wall}s {nrows} rows",
                  file=sys.stderr)
    hi, lo = max(sizes), min(sizes)
    results[f"ratio_{hi // lo}x"] = round(walls[hi] / walls[lo], 2)
    return results


def dedup_ratio_diagnostics(spark, sf_dir: str) -> dict:
    """Candidate/survivor counts for the two heaviest dedup screens
    (round-8 verdict item 1): quadratic candidate EXPLOSION would show
    up here long before a wall-clock blow-up does.

    - allpairs_prefix: distinct prefix-join candidate pairs vs
      exact-Jaccard-verified pairs.
    - span_coverage (linear by construction): total fingerprinted
      windows vs windows whose fingerprint repeats corpus-wide — the
      'candidate' mass the semi-join ships back.
    """
    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.operators.dedup import (
        _SPAN_K,
        _allpairs_prefix_stages,
    )
    from hadoop_spark_pspd_spark.registry import load_all

    reg = load_all()
    doc_sorted, candidates = _allpairs_prefix_stages(spark, sf_dir)
    cand = candidates.count()
    surv = reg["dedup_allpairs_prefix"].fn(spark, sf_dir).count()
    spark.catalog.clearCache()

    from hadoop_spark_pspd_spark.catalog import Tables

    docs = Tables(spark, sf_dir).documents.select(
        "doc_id", F.octet_length("text").cast("long").alias("n")
    ).filter(F.col("n") >= _SPAN_K)
    total_windows = docs.agg(
        F.sum(F.col("n") - _SPAN_K + 1).alias("w")
    ).collect()[0]["w"]
    hx = F.hex(F.col("text").cast("binary"))
    wins = Tables(spark, sf_dir).documents.select(
        F.octet_length("text").cast("long").alias("n"), hx.alias("hx")
    ).filter(F.col("n") >= _SPAN_K).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - _SPAN_K + 1),
                lambda i: F.md5(
                    F.substring(F.col("hx"), i * 2 - 1, 2 * _SPAN_K)
                ),
            )
        ).alias("h")
    )
    dup_windows = wins.groupBy("h").agg(
        F.count("*").alias("c")
    ).filter(F.col("c") > 1).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("d")
    ).collect()[0]["d"]
    spark.catalog.clearCache()
    return {
        "allpairs_prefix": {
            "candidates": int(cand),
            "survivors": int(surv),
            "survivor_ratio": round(surv / cand, 4) if cand else None,
        },
        "span_coverage": {
            "total_windows": int(total_windows),
            "dup_windows": int(dup_windows),
            "dup_fraction": (
                round(dup_windows / total_windows, 6) if total_windows else None
            ),
        },
    }


def main() -> None:
    global COPIES, SALT
    if "--copies" in sys.argv:
        i = sys.argv.index("--copies")
        COPIES = int(sys.argv[i + 1])
        del sys.argv[i : i + 2]
    if "--salt" in sys.argv:
        SALT = True
        sys.argv.remove("--salt")
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "--ratios":
        sf = sys.argv[2] if len(sys.argv) > 2 else SF_BASE
        spark = get_spark("pspd_scale_bench")
        print(json.dumps(
            {"metric": "dedup_ratios", "sf_dir": sf,
             **dedup_ratio_diagnostics(spark, sf)}
        ))
        return
    if mode == "--neardup-uniform":
        sizes = (2000, 20000)
        dim = None
        if "--dim" in sys.argv:
            i = sys.argv.index("--dim")
            dim = int(sys.argv[i + 1])
            del sys.argv[i:i + 2]
        if len(sys.argv) > 2 and "," in sys.argv[2]:
            sizes = tuple(int(x) for x in sys.argv[2].split(","))
        semantic = "--semantic" in sys.argv
        spark = get_spark("pspd_scale_bench")
        print(json.dumps(
            {"metric": "neardup_uniform",
             **neardup_uniform_demo(spark, sizes, semantic, dim)}
        ))
        return
    # --queries a,b,c : scale-check an explicit query list instead of the
    # bench=True headline set (e.g. newly added heavy operators)
    names = None
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
        mode = "--scale-only"
    spark = get_spark("pspd_scale_bench")
    out: dict = {"metric": "scale_bench"}
    if mode != "--skew-only":
        marker = Path(sim_dir()) / "_MARKER.json"
        stale = (
            "--rebuild" in sys.argv
            or not marker.exists()
            or marker.read_text() != _sim_signature()
        )
        if stale:
            build_sim_sf1(spark)
        base = run_suite(spark, SF_BASE, names)
        sim = run_suite(spark, sim_dir(), names)
        out["sf0_1"] = base
        out["sim_sf1"] = sim
        out["ratio"] = {
            n: round(sim[n] / base[n], 1) if base[n] else None for n in base
        }
    if mode != "--scale-only":
        out["skew"] = skew_demo(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
