"""Hash-based sketch expressions: MinHash signatures, SimHash, band keys.

MinHash (SURVEY §7.1 step 6): per permutation i, h_i(shingle) =
xxhash64(i, shingle); the signature component is min over the document's
shingle set. Computed as array_min(transform(...)) over the per-doc
collected shingle set — map-side, no UDF, no driver materialization, no
shuffle beyond the collect_set the caller already needs.

SimHash: 64-bit fingerprint where bit b = sign of sum over tokens of
(+1 if bit b of xxhash64(token) else -1). Expressed with bitwise ops +
grouped sums — again one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minhash_components(shingle: Column, num_perm: int) -> list[Column]:
    """h_i(shingle) for i in 0..num_perm-1 (seeded via a prepended literal)."""
    return [
        F.xxhash64(F.lit(i), shingle).alias(f"h{i}")
        for i in range(num_perm)
    ]


def minhash_components_from_set(
    shingle_set: Column, num_perm: int, prefix: str = "mh"
) -> list[Column]:
    """Signature columns computed map-side from a per-doc shingle array.

    Same sketch as the classic explode->groupBy(min) formulation
    (h_i = xxhash64(i, s), component = min over the doc's set) but taking
    the already-collected shingle array, so it adds NO shuffle: the LSH
    verify step needs ``collect_set(shingle)`` anyway, and the signature
    becomes a projection over that relation.
    """
    return [
        F.array_min(
            F.transform(shingle_set, lambda s: F.xxhash64(F.lit(i), s))
        ).alias(f"{prefix}{i}")
        for i in range(num_perm)
    ]


def band_keys(sig_prefix: str, num_perm: int, bands: int) -> list[Column]:
    """Hash each band (contiguous rows of the signature) to one bucket key."""
    rows_per_band = num_perm // bands
    keys = []
    for b in range(bands):
        cols = [
            F.col(f"{sig_prefix}{b * rows_per_band + r}")
            for r in range(rows_per_band)
        ]
        keys.append(F.xxhash64(F.lit(b), *cols).alias(f"band{b}"))
    return keys


def simhash64_md5(exploded: DataFrame, doc_col: str, token_col: str) -> DataFrame:
    """doc_col -> simhash (long): per-bit sign of summed +/-1 votes, with
    the 64 bit-hashes derived from md5 (not xxhash64) so a SQL oracle can
    recompute the identical fingerprint: md5 is byte-identical
    cross-engine, and Spark ``conv(substr(md5(x),1,k),16,10)`` equals
    DuckDB ``CAST(('0x'||substr(md5(x),1,k)) AS UBIGINT)`` exactly for
    k <= 13 (the repo's derandomization recipe). Bits 0..51 come from the
    first 13 hex chars, bits 52..63 from the next 3."""
    tok = F.col(token_col)
    h1 = F.conv(F.substring(F.md5(tok), 1, 13), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(tok), 14, 3), 16, 10).cast("long")

    def bit(b: int) -> Column:
        src, off = (h1, b) if b < 52 else (h2, b - 52)
        return F.shiftright(src, off).bitwiseAND(F.lit(1))

    votes = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"v{b}")
        for b in range(64)
    ]
    agg = exploded.groupBy(doc_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
        )
    return agg.select(F.col(doc_col), sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — via bit_count (Spark >= 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))
