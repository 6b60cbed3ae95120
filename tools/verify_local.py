"""Local mimic of the driver's correctness gate.

Runs every registered query at a given sf_dir through Spark AND its DuckDB
oracle, then compares row count, sorted column names, and the order-
insensitive multiset of values (exact for ints/strings/timestamps; floats
must match to 1e-9 relative — our determinism conventions should make them
bit-identical, so any drift is flagged loudly).

Usage: python tools/verify_local.py [--json OUT.json] [--plain]
                                    [sf_dir] [query ...]

--json writes the per-query result record (name -> rows/schema/hash
matches, row counts, err, wall seconds) in the driver's
CORRECTNESS_r{N}.json shape — the committed full-sweep evidence artifact
(SWEEP_r{N}.json).

--plain runs against a BARE SparkSession (no engine confs: Spark's 200
shuffle partitions, default non-pinned timezone, no nanosAsLong) — the
strict simulation of the driver, which builds its own session. The
engine's defense is catalog.Tables calling pin_session_conf on
construction; this mode proves that defense suffices.
"""

from __future__ import annotations

import json
import math
import pickle
import subprocess
import sys
import time
from datetime import datetime, timezone
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_spark_pspd_spark.catalog import TABLES  # noqa: E402
from hadoop_spark_pspd_spark.oracle_audit import (  # noqa: E402
    drifting_columns,
)
from hadoop_spark_pspd_spark.registry import load_all  # noqa: E402
from hadoop_spark_pspd_spark.session import get_spark  # noqa: E402

# oracle-runner subprocess body: fresh interpreter + capped DuckDB per
# oracle (see run_oracle below for why in-process connections degrade)
_ORACLE_WORKER = r"""
import pickle, sys
payload = pickle.load(sys.stdin.buffer)
import duckdb
con = duckdb.connect(config={"memory_limit": "24GB", "threads": 8})
# the CLI-style progress bar writes CRs to STDOUT on multi-second
# queries, corrupting the pickle stream this worker ships back
con.execute("SET enable_progress_bar = false")
for t in payload["tables"]:
    con.execute(
        "CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
        % (t, payload["sf_dir"], t)
    )
rel = con.sql(payload["sql"])
out = {"cols": rel.columns, "types": [str(t) for t in rel.types]}
out["rows"] = rel.fetchall()
con.close()
pickle.dump(out, sys.stdout.buffer, protocol=pickle.HIGHEST_PROTOCOL)
"""


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key(row):
    out = []
    for v in row:
        v = _norm(v)
        if isinstance(v, float):
            out.append(f"{v:.9g}")
        else:
            out.append(repr(v))
    return tuple(out)


def _values_equal(a, b) -> bool:
    a, b = _norm(a), _norm(b)
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count {len(spark_rows)} vs {len(duck_rows)}")
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns {sorted(spark_cols)} vs {sorted(duck_cols)}")
        return problems
    # align column order by name
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_sorted = sorted(
        [tuple(r[i] for i in s_order) for r in spark_rows], key=_key
    )
    d_sorted = sorted(
        [tuple(r[i] for i in d_order) for r in duck_rows], key=_key
    )
    exact = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        row_ok = all(_values_equal(a, b) for a, b in zip(sr, dr))
        # repr-strict: catches int-vs-float type drift a driver hash would
        bit_ok = all(repr(_norm(a)) == repr(_norm(b)) for a, b in zip(sr, dr))
        exact += bit_ok
        if not row_ok and len(problems) < 4:
            problems.append(f"row {i}: {sr} vs {dr}")
    if not problems and exact != len(s_sorted):
        problems.append(
            f"NOT BIT-IDENTICAL: {len(s_sorted) - exact}/{len(s_sorted)} rows "
            "differ at float ulp level (would likely fail a strict hash)"
        )
    return problems


# Plan-smell WARNs that must never appear during a sweep (round-7
# verdict item 6): an unpartitioned WindowExec is a single-partition
# global sort at scale; a trivially-true equals predicate means a
# self-join silently degenerated to a cross-join on the ambiguous side.
WARN_PATTERNS = (
    "No Partition Defined for Window operation",
    "Constructing trivially true equals predicate",
)


def _capture_stderr():
    """Tee fd 2 (inherited by the Spark JVM) into a log file so JVM-side
    WARN lines are auditable, while still reaching the console."""
    import os
    import subprocess
    import tempfile

    path = Path(tempfile.gettempdir()) / f"pspd_sweep_warns_{os.getpid()}.log"
    path.write_bytes(b"")
    console = os.dup(2)
    tee = subprocess.Popen(
        ["tee", str(path)], stdin=subprocess.PIPE, stdout=console
    )
    os.dup2(tee.stdin.fileno(), 2)
    return path


def _scan_warnings(path: Path, offset: int) -> list[str]:
    try:
        with open(path, "rb") as fh:
            fh.seek(offset)
            text = fh.read().decode("utf-8", "replace")
    except OSError:
        return []
    return sorted({p for p in WARN_PATTERNS if p in text})


def main() -> int:
    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    plain = "--plain" in args
    if plain:
        args.remove("--plain")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    warn_log = _capture_stderr()
    reg = load_all()
    if plain:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("verify_plain")
            .master("local[8]")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark("verify_local")
    # one-time Python-DataSource worker spawns (~7-10 s) land on session
    # setup instead of the single kafka query's clock — same philosophy
    # as bench.py's file-index/codegen warmup; results are unaffected
    if not only or "stream_kafka_roundtrip" in only:
        from hadoop_spark_pspd_spark.operators.kafka_pipeline import (
            prewarm_python_datasource,
        )

        prewarm_python_datasource(spark)
    def run_oracle(sql: str) -> dict:
        # oracle in a SHORT-LIVED SUBPROCESS (round-8 verdict item 3):
        # per-query fresh connections (r8) and explicit memory/thread
        # caps (r9 first attempt) both failed to remove the in-situ
        # degradation — graph_kcore's recursive-CTE oracle ran 6.6 s
        # standalone but 28-37 s late in a sweep sharing the process
        # with the 16g Spark JVM driver. A fresh interpreter per oracle
        # (~0.3 s each, ~2 min over a full sweep) makes oracle_sec a
        # trustworthy signal. Caps stay on inside the worker.
        p = subprocess.run(
            [sys.executable, "-c", _ORACLE_WORKER],
            input=pickle.dumps(
                {"sql": sql, "sf_dir": sf_dir, "tables": list(TABLES)}
            ),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=600,
        )
        if p.returncode != 0:
            raise RuntimeError(
                p.stderr.decode("utf-8", "replace").strip()[-300:]
            )
        return pickle.loads(p.stdout)

    n_pass = n_fail = n_weak = 0
    results: dict[str, dict] = {}
    warned: dict[str, list[str]] = {}
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        warn_off = warn_log.stat().st_size
        t0 = time.time()
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "wall_sec": None,
        }
        results[name] = rec
        try:
            sdf = q.fn(spark, sf_dir)
            spark_cols = sdf.columns
            # the driver canonicalizes output with a pandas sort, where
            # list/dict-valued cells are unhashable (CORRECTNESS_r03:
            # `TypeError: unhashable type: 'list'` on array<double>
            # columns) — reject non-scalar output columns up front so
            # this mirror is at least as strict as the driver
            from pyspark.sql.types import ArrayType, MapType, StructType

            nonscalar = [
                f"{fld.name}: {fld.dataType.simpleString()}"
                for fld in sdf.schema.fields
                if isinstance(fld.dataType, (ArrayType, MapType, StructType))
            ]
            if nonscalar:
                raise TypeError(
                    "non-scalar output column(s) would crash the driver's "
                    f"comparator: {nonscalar}"
                )
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            rec["engine_sec"] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"[:300]
            rec["wall_sec"] = round(time.time() - t0, 2)
            n_fail += 1
            continue
        finally:
            # queries cache() intermediates; a 129-query session would
            # accumulate them all without a per-query clear (ADVICE r01)
            spark.catalog.clearCache()
        if q.oracle is None:
            rec["err"] = "no_oracle"
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            rec["wall_sec"] = round(time.time() - t0, 2)
            print(
                f"weak  {name}: rows-only ({len(spark_rows)} rows, "
                f"{time.time()-t0:.1f}s)"
            )
            n_weak += 1
            continue
        try:
            payload = run_oracle(q.oracle)
            duck_cols = payload["cols"]
            # type-drift audit: DuckDB HUGEINT/DECIMAL/unsigned OUTPUT
            # columns pandas-coerce to dtypes Spark never emits, so the
            # driver's pandas canonicalizer hash-mismatches even when the
            # cursor values below compare equal (the invisible-to-three-
            # local-sweeps CORRECTNESS_r03/r04 text_nucleus_filter bug)
            drift = drifting_columns(duck_cols, payload["types"])
            if drift:
                raise TypeError(
                    "oracle output type would drift under the driver's "
                    f"pandas canonicalizer: {drift}"
                )
            duck_rows = payload["rows"]
            rec["oracle_rows"] = len(duck_rows)
            rec["oracle_sec"] = round(time.time() - t0 - rec["engine_sec"], 2)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"[:300]
            rec["wall_sec"] = round(time.time() - t0, 2)
            n_fail += 1
            continue
        problems = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        rec["rows_match"] = len(spark_rows) == len(duck_rows)
        rec["schema_match"] = sorted(c.lower() for c in spark_cols) == sorted(
            c.lower() for c in duck_cols
        )
        rec["hash_match"] = not problems
        rec["wall_sec"] = round(time.time() - t0, 2)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
            rec["err"] = "; ".join(str(p) for p in problems)[:300]
            n_fail += 1
        else:
            print(
                f"pass  {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)"
            )
            n_pass += 1
        hits = _scan_warnings(warn_log, warn_off)
        if hits:
            warned[name] = hits
            rec["warnings"] = hits
    # final full-file pass catches anything tee flushed late or emitted
    # outside a query window (session build, registry import)
    global_hits = _scan_warnings(warn_log, 0)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    if warned:
        for name, hits in sorted(warned.items()):
            print(f"WARN-AUDIT  {name}: {'; '.join(hits)}")
    if global_hits and not warned:
        print(f"WARN-AUDIT  <unattributed>: {'; '.join(global_hits)}")
    if global_hits or warned:
        print("WARN-AUDIT: forbidden plan-smell warnings present — failing")
    if json_path:
        Path(json_path).write_text(json.dumps(
            {
                "sf_dir": sf_dir,
                "generated_utc": datetime.now(timezone.utc).isoformat(
                    timespec="seconds"
                ),
                "summary": {
                    "pass": n_pass, "fail": n_fail, "rows_only": n_weak,
                    "total": n_pass + n_fail + n_weak,
                    "warn_audit": sorted(warned) or (
                        ["<unattributed>"] if global_hits else []
                    ),
                },
                "queries": results,
            },
            indent=1,
        ) + "\n")
        print(f"# wrote {json_path}")
    return 1 if (n_fail or warned or global_hits) else 0


if __name__ == "__main__":
    raise SystemExit(main())
