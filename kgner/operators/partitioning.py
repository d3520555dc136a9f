"""Scan-parallelism guard for unsplittable inputs (optimization guide §2.5).

The driver's parquet tables are written as ONE file with ONE row group per
table, so a scan of `documents` (or a union of two such scans) yields 1-2
input partitions no matter how many cores the session has: every map-heavy
stage rooted at that scan — shingle explosion, token hashing, regex quality
features, span-decode UDFs — runs on 1-2 cores of 32 until the first
shuffle. `spread_scan` inserts one cheap keyed repartition (the input rows
are skinny: ids + text) so the expensive downstream map work parallelizes.

Scale-adaptive by construction: the guard compares the plan's actual
partition count against the session's parallelism and is a NO-OP whenever
the scan already has enough splits — a real multi-file 100 TB table never
pays the extra exchange. The repartition key is a deterministic id column
(guide §2.5: never hash on rand()-derived keys), so retried tasks reproduce
the same row placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-core task multiplier: a few tasks per core amortizes stragglers
# without per-task overhead dominating (the same 8x used by bench scaling
# workloads would be overkill for sub-second stages).
SPREAD_MULT = 2


def spread_scan(df: DataFrame, *key_cols: str, mult: int = SPREAD_MULT) -> DataFrame:
    """Repartition `df` to cores*mult partitions keyed on `key_cols` iff its
    current partitioning is below half that target; otherwise return it
    unchanged. Keyed (hash) repartition avoids round-robin's
    sort-before-repartition pass and is deterministic under task retry."""
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism * mult
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur * 2 > target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
