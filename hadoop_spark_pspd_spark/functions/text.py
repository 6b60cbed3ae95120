"""Text column expressions: tokenization, shingles, normalization.

Tokenizer parity note (SURVEY.md §7.3): the reference's batch WordCount uses
Java StringTokenizer (delimiters " \\t\\n\\r\\f", never emits empty tokens —
cluster/tools/run_fault_tests.py:26-30 invokes the stock Hadoop example);
the streaming pipeline splits + uppercases (docs/README.md:257). The engine
rule is the EXPLICIT class ``[ \\t\\n\\r\\f]+`` + empty-token filter, not
``\\s+``: Java regex ``\\s`` includes vertical tab (\\x0b) while DuckDB's
RE2 ``\\s`` and StringTokenizer's delimiter set don't — found by the
hypothesis property test. The explicit class means Spark, the DuckDB
oracle (``string_split_regex(text, '[ \\t\\n\\r\\f]+')``) and the reference
tokenizer agree on every input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE_RE = r"[ \t\n\r\f]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (StringTokenizer semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WHITESPACE_RE), lambda t: t != F.lit(""))


def words_exploded(col: Column | str, alias: str = "word") -> Column:
    """One row per token — the engine's UDTF-shaped op (SURVEY §2.3 F1)."""
    return F.explode(tokens(col)).alias(alias)


def word_ngrams(toks: Column, n: int = 2) -> Column:
    """ALL word n-grams in order (repeats kept — repetition metrics need
    the raw multiset, unlike the distinct shingle set below)."""
    count = F.size(toks) - F.lit(n - 1)
    seq = F.when(count > 0, F.sequence(F.lit(0), count - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(seq, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array.

    Built entirely from higher-order functions (JVM-side, no UDF):
    transform over a 0..len-n index sequence, slice, join with spaces.
    Documents shorter than n words produce an empty array.
    """
    count = F.size(toks) - F.lit(n - 1)
    seq = F.when(count > 0, F.sequence(F.lit(0), count - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(seq, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact-dup fingerprinting: lower, trim, collapse ws."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), WHITESPACE_RE, " ")
