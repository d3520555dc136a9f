"""Cross-engine-stable 64-bit hash Columns (JVM-side, md5-derived).

xxhash64 is the production hash everywhere in this engine (fastest JVM path),
but its values are engine-specific — a DuckDB oracle cannot reproduce them.
These helpers derive 64 bits from md5 instead (first 8 bytes, big-endian),
matching kgner.textops.stable_hash64 and reproducible in any md5-capable SQL
engine (DuckDB: ('0x' || substr(md5(x), 1, 16))::UBIGINT), which lets the
contract queries hash-check minhash/simhash/feature-hash pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO63 = "9223372036854775808"
_TWO64 = "18446744073709551616"


def stable_hash64_u(c: Column) -> Column:
    """First 8 md5 bytes as UNSIGNED 64-bit (decimal(20,0)) — use where only
    ordering/equality matter (minhash mins, feature buckets)."""
    return F.conv(F.substring(F.md5(c), 1, 16), 16, 10).cast("decimal(20,0)")


def stable_hash64_col(c: Column) -> Column:
    """Signed-long twin of kgner.textops.stable_hash64 — use where bit ops
    are needed (simhash): shiftrightunsigned(signed, j) & 1 equals the
    unsigned value's bit j."""
    u = stable_hash64_u(c)
    wrapped = (u.cast("decimal(21,0)") - F.lit(_TWO64).cast("decimal(21,0)")).cast(
        "long"
    )
    return F.when(u >= F.lit(_TWO63).cast("decimal(20,0)"), wrapped).otherwise(
        u.cast("long")
    )


def stable_seeded_hash_fn(c: Column, seed: int) -> Column:
    """Seeded unsigned variant for minhash permutation families:
    h_seed(x) = stable_hash64_u(seed || ':' || x)."""
    return stable_hash64_u(F.concat(F.lit(f"{seed}:"), c))
