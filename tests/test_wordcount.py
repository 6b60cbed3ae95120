"""Reference-parity golden tests for WordCount (SURVEY §5.2-2).

Replicates generate_wordcount_data.sh:15 semantics: a fixed 10-word
vocabulary + per-file idxNN + per-line lineN varying tokens, then asserts
the invariants the reference's counters encode (sum of counts == token
count — reports/fault_test_20251115-184204.job.log:154; distinct words ==
fixed vocab + varying tokens — :163).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.wordcount import (
    wordcount_df,
    wordcount_text_dir,
    write_tsv,
)

FIXED_VOCAB = (
    "hadoop tolerancia falhas desempenho wordcount texto "
    "dados processamento throughput latencia"
).split()


def _synthetic_corpus(spark, files=3, lines_per_file=50):
    rows = []
    for f in range(files):
        for line in range(lines_per_file):
            rows.append((" ".join(FIXED_VOCAB + [f"idx{f:02d}", f"linha{line}"]),))
    return spark.createDataFrame(rows, "value string")


def test_wordcount_invariants(spark):
    files, lines = 3, 50
    corpus = _synthetic_corpus(spark, files, lines)
    wc = wordcount_df(corpus).collect()
    counts = {r["word"]: r["cnt"] for r in wc}
    total_lines = files * lines
    # every line emits len(FIXED_VOCAB) + 2 tokens
    assert sum(counts.values()) == total_lines * (len(FIXED_VOCAB) + 2)
    # distinct = fixed vocab + per-file tokens + per-line tokens
    assert len(counts) == len(FIXED_VOCAB) + files + lines
    for w in FIXED_VOCAB:
        assert counts[w] == total_lines
    assert counts["idx00"] == lines
    assert counts["linha0"] == files


def test_empty_token_handling(spark):
    """StringTokenizer parity (SURVEY §7.3): leading/trailing/multiple
    whitespace must not produce empty-string words."""
    corpus = spark.createDataFrame(
        [("  a  b ",), ("\t c \t",), ("",), ("   ",)], "value string"
    )
    counts = {r["word"]: r["cnt"] for r in wordcount_df(corpus).collect()}
    assert counts == {"a": 1, "b": 1, "c": 1}


def test_text_dir_scan_and_tsv_sink(spark, tmp_path):
    """Reference S1 (recursive dir scan) + S2 (TSV sink) end to end."""
    sub = tmp_path / "in" / "nested"
    sub.mkdir(parents=True)
    (tmp_path / "in" / "f1.txt").write_text("x y x\n")
    (sub / "f2.txt").write_text("y z\n")
    wc = wordcount_text_dir(spark, str(tmp_path / "in"))
    counts = {r["word"]: r["cnt"] for r in wc.collect()}
    assert counts == {"x": 2, "y": 2, "z": 1}

    out = tmp_path / "out"
    write_tsv(wc, str(out))
    lines = sorted(
        line
        for p in out.glob("part-*")
        for line in p.read_text().splitlines()
    )
    assert lines == ["x\t2", "y\t2", "z\t1"]
    # overwrite semantics (reference crashed without pre-delete —
    # reports/fault_test_20251115-181827.job.log:2; ours must not)
    write_tsv(wc, str(out))


def test_cli_wordcount_roundtrip(spark, tmp_path):
    """python -m hadoop_spark_pspd_spark wordcount: the reference's batch
    entry point as an engine CLI (in-process to reuse the session)."""
    import json

    from hadoop_spark_pspd_spark.__main__ import main

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("ola mundo\nola spark\n")
    out = tmp_path / "out"
    rc = main(["wordcount", str(src), str(out)])
    assert rc == 0
    lines = sorted(
        line.split("\t")
        for f in out.glob("part-*.csv")
        for line in f.read_text().splitlines()
    )
    assert lines == [["mundo", "1"], ["ola", "2"], ["spark", "1"]]


def test_cli_list_and_unknown(capsys):
    from hadoop_spark_pspd_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "wc_words" in out and "[oracled]" in out
