"""Portable (engine-agnostic) hashing for dedup/similarity operators.

MinHash/SimHash signatures are only oracle-checkable if Spark and the
DuckDB oracle compute bit-identical hashes.  Neither engine's native
hash matches the other, so we standardize on the top 60 bits of MD5,
parsed from the hex digest — both engines produce identical lowercase
hex MD5, and 60 bits fits a signed BIGINT on both.

Spark :  ``CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)``
DuckDB:  ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``

Derived hash family for MinHash: ``h_k(x) = (a_k * h(x) + b_k) mod p``
with p = 2^31 - 1 (Mersenne), a_k/b_k deterministic odd constants —
plain 64-bit integer math, identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def portable_hash60(col: Column) -> Column:
    """Top 60 bits of md5(col) as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB expression equivalent to :func:`portable_hash60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def hash_family(col: Column, k: int) -> list[Column]:
    """k universal-hash values of ``col`` (for MinHash signatures)."""
    base = portable_hash60(col) % F.lit(MERSENNE_P)
    out = []
    for i in range(k):
        a = 2 * i + 1          # odd multiplier
        b = 7919 * (i + 1)     # arbitrary fixed offsets
        out.append((F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE_P))
    return out


def hash_family_sql(expr: str, k: int) -> list[str]:
    """DuckDB expressions equivalent to :func:`hash_family`."""
    base = f"({portable_hash60_sql(expr)} % {MERSENNE_P})"
    return [f"(({2*i+1} * {base} + {7919*(i+1)}) % {MERSENNE_P})"
            for i in range(k)]
