"""Portable stable hashing: identical values in Spark and ANSI-SQL oracles.

Spark's native ``xxhash64``/``hash`` and DuckDB's ``hash`` are different
algorithms, so oracle-checked operators hash through ``md5`` (identical hex
output in both engines) and take the first 15 hex digits as a 60-bit
non-negative BIGINT:

* Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to LONG
* DuckDB: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``

At 100 TB scale, swap ``stable_hash60`` for ``F.xxhash64`` via the
``hash_mode`` knobs on the dedup operators -- same plan shape, ~3x cheaper
hashing, no oracle parity.

MinHash permutations are ``(a*h + b) mod p`` with ``p = 2^31 - 1`` and
deterministic ``(a, b)`` coefficient pairs; ``h`` is first reduced mod p so
all intermediate products stay below 2^62 (no BIGINT overflow in either
engine).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1; the classic minhash universal-hash modulus.
MINHASH_P = 2_147_483_647


def stable_hash60(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_stable_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_coeffs(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs, a odd and nonzero, both < p."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P) | 1, rng.randrange(0, MINHASH_P))
        for _ in range(n)
    ]


def minhash_term(h: Column, a: int, b: int) -> Column:
    """One permuted hash: ``(a * (h % p) + b) % p`` -- overflow-safe."""
    return (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def sql_minhash_term(h_expr: str, a: int, b: int) -> str:
    return f"(({a} * (({h_expr}) % {MINHASH_P}) + {b}) % {MINHASH_P})"
