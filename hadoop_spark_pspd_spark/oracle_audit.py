"""Oracle output-type audit: catch DuckDB types that drift under pandas.

The driver canonicalizes both engines' results through pandas before
hashing. DuckDB's ``.df()`` coerces several logical types in ways Spark's
``toPandas()`` never produces, so an oracle whose OUTPUT column has one of
these types hash-mismatches even when every value is numerically equal:

  * HUGEINT / UHUGEINT -> float64  (``SUM(BIGINT)`` windows/aggregates —
    the CORRECTNESS_r03/r04 ``text_nucleus_filter`` failure: Spark int64
    ``1`` vs oracle float64 ``1.0``)
  * DECIMAL(p,s)       -> float64 via decimal.Decimal (and the driver may
    hash the Decimal repr itself)
  * UTINYINT/USMALLINT/UINTEGER/UBIGINT -> uint8/16/32/64 (Spark has no
    unsigned types; dtype-aware comparators flag int64 vs uint64)

The sweep mirror (tools/verify_local.py) fetches through the cursor
(Python ints), which silently normalizes all of these — three green local
sweeps missed the r3/r4 driver failure. This audit makes the mirror
strictly stronger than the driver: any oracle emitting a drifting output
type FAILS locally before the driver ever samples it.

Interior CTE columns may be any type; only the final SELECT's output
columns are audited (that is all the driver hashes).
"""

from __future__ import annotations

import re

# Type-name prefixes (DuckDBPyType str form) that pandas-coerce to a dtype
# Spark cannot emit. DECIMAL prints as ``DECIMAL(p,s)`` -> prefix match.
_DRIFT_PREFIXES = (
    "HUGEINT",
    "UHUGEINT",
    "DECIMAL",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
)

# Structured outputs crash the driver's pandas sort outright
# (CORRECTNESS_r03 ``unhashable type: 'list'``). ``\[\d*\]`` covers both
# LIST (``INTEGER[]``) and fixed-size ARRAY (``INTEGER[3]``) suffixes.
_NONSCALAR_RE = re.compile(r"\[\d*\]$|^(STRUCT|MAP|LIST|ARRAY|UNION)\b")


def drifting_columns(cols, type_strs) -> list[str]:
    """Return ``["col: TYPE", ...]`` for (column, type-string) pairs whose
    type would drift or crash under the driver's pandas canonicalizer.
    Empty list == safe. Takes plain strings so the audit also works on
    results shipped back from a subprocess oracle runner."""
    bad = []
    for col, t in zip(cols, type_strs):
        if t.startswith(_DRIFT_PREFIXES) or _NONSCALAR_RE.search(t):
            bad.append(f"{col}: {t}")
    return bad


def drifting_oracle_columns(rel) -> list[str]:
    """drifting_columns over a live DuckDB relation."""
    return drifting_columns(rel.columns, [str(t) for t in rel.types])
