"""Engine CLI — run any registered query from the shell.

    python -m hadoop_spark_pspd_spark list [--tag TAG]
    python -m hadoop_spark_pspd_spark run NAME [--sf DIR] [--limit N]
                                            [--explain] [--json]
    python -m hadoop_spark_pspd_spark wordcount INPUT_DIR OUTPUT_DIR

`wordcount` is the reference's batch entry point (run_fault_tests.py:26-30
semantics: recursive text scan -> tokenize -> count -> sorted TSV), pointed
at arbitrary directories.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hadoop_spark_pspd_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", default=None, help="filter by tag")

    p_run = sub.add_parser("run", help="run a registered query")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true",
                       help="print the formatted physical plan instead")
    p_run.add_argument("--json", action="store_true",
                       help="print rows as JSON lines")

    p_wc = sub.add_parser("wordcount", help="reference batch WordCount")
    p_wc.add_argument("input_dir")
    p_wc.add_argument("output_dir")

    args = p.parse_args(argv)

    from .registry import load_all
    from .session import get_spark

    reg = load_all()

    if args.cmd == "list":
        for name in sorted(reg):
            q = reg[name]
            if args.tag and args.tag not in q.tags:
                continue
            kind = "oracled" if q.oracle else "rows-only"
            if "anchor" in q.tags:
                # correctness anchors kept for strategy comparison — a
                # faster registered equivalent is the path to use
                kind += ",ANCHOR-ONLY"
            doc = (q.doc or "").strip().split("\n")[0][:70]
            print(f"{name:32s} [{kind}] {doc}")
        return 0

    spark = get_spark()
    if args.cmd == "wordcount":
        from .operators.wordcount import wordcount_text_dir
        from .sources.writers import write_tsv

        counts = wordcount_text_dir(spark, args.input_dir)
        write_tsv(counts.orderBy("word"), args.output_dir,
                  sort_cols=["word"])
        n = counts.count()
        print(json.dumps({"distinct_words": n, "output": args.output_dir}))
        return 0

    if args.name not in reg:
        print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
        return 2
    df = reg[args.name].fn(spark, args.sf)
    if args.explain:
        from .plans.checks import formatted_plan

        print(formatted_plan(df))
        return 0
    rows = df.limit(args.limit).collect()
    if args.json:
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        df.limit(args.limit).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
