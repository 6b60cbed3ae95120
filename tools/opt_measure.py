"""Round-11 optimization measurement harness.

Times individual registered queries with the noop sink (guide §1.4) in
one warm session — bench.py's methodology applied to ANY query, not just
the bench set — and optionally dumps the formatted physical plan to
plans/r11/<query>_<tag>.txt (guide §1 "capture .explain('formatted')").

Usage:
    python tools/opt_measure.py [--runs N] [--plan-tag TAG] \
        [--sf SF_DIR] query [query ...]

Prints one JSON line: {"queries": {name: {"median": s, "min": s,
"runs": [...]}}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_spark_pspd_spark.plans.checks import formatted_plan  # noqa: E402
from hadoop_spark_pspd_spark.registry import load_all  # noqa: E402
from hadoop_spark_pspd_spark.session import get_spark  # noqa: E402

# streaming queries manage their own materialization (memory sink);
# their fn() already runs the stream to completion — time fn() alone.
_SELF_MATERIALIZING_PREFIX = "stream_"


def main() -> int:
    args = sys.argv[1:]
    runs, plan_tag, sf_dir = 3, None, "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plan-tag":
            plan_tag = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    reg = load_all()
    spark = get_spark("pspd_opt_measure")
    # warm the session the way bench.py does
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    spark.range(1).select(
        F.filter(F.array(F.lit("a")), lambda x: x != F.lit("")),
        F.transform(F.sequence(F.lit(0), F.lit(1)), lambda i_: i_ + 1),
    ).collect()

    out: dict[str, dict] = {}
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    for pass_no in range(runs):
        for name in names:
            q = reg[name]
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            if name.startswith(_SELF_MATERIALIZING_PREFIX):
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            out.setdefault(name, {"runs": []})["runs"].append(wall)
            print(f"# pass {pass_no + 1}/{runs} {name}: {wall}s",
                  file=sys.stderr)
            if plan_tag and pass_no == 0:
                plans_dir.mkdir(parents=True, exist_ok=True)
                try:
                    (plans_dir / f"{name}_{plan_tag}.txt").write_text(
                        formatted_plan(df)
                    )
                except Exception as e:  # streaming DFs have no batch plan
                    print(f"# plan dump failed for {name}: {e}",
                          file=sys.stderr)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    for name, rec in out.items():
        rs = sorted(rec["runs"])
        rec["median"] = rs[len(rs) // 2]
        rec["min"] = rs[0]
    print(json.dumps({"queries": out, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
