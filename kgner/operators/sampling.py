"""Corpus sampling operators (SURVEY §2.U U-2/U-3, T-5).

- upsample:   x N replication without data copy until shuffle
  (flair/trainers/finetune_trainer.py:185-198 direct_upsample).
- stratified_sample: seeded per-stratum Bernoulli sampling — the Spark
  analogue of the reference's p^0.7 language-resampling draw
  (finetune_trainer.py:98-103,168-172); sampleBy is seed-deterministic for a
  fixed partitioning, so we pin determinism to the DATA instead: keep rows
  where xxhash64(id, seed) mod 10^6 < fraction * 10^6. Fully reproducible
  across cluster layouts — the property sampleBy cannot give you.
- resample_weights: the p^alpha weight table itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsample(df: DataFrame, times: int) -> DataFrame:
    """Replicate every row `times` x (lazy: explode of a repeat array)."""
    return df.withColumn(
        "__rep", F.explode(F.array_repeat(F.lit(1), times))
    ).drop("__rep")


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling: row kept iff
    pmod(xxhash64(id, seed), 1e6) < fraction(stratum) * 1e6.

    Unlike DataFrame.sampleBy, the decision depends only on (id, seed) — the
    same rows are kept at any partitioning/cluster size, so a resumed or
    re-scaled run trains on the identical sample.
    """
    M = 1_000_000
    frac = None
    for stratum, p in sorted(fractions.items()):
        thresh = F.lit(round(p * M))  # round, not truncate (0.29*1e6 == 290000)
        frac = (F.when if frac is None else frac.when)(
            F.col(stratum_col) == stratum, thresh
        )
    frac = frac.otherwise(F.lit(0)) if frac is not None else F.lit(0)
    h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(M))
    return df.filter(h < frac)


def resample_weights(df: DataFrame, stratum_col: str, alpha: float = 0.7) -> DataFrame:
    """-> (stratum, n, weight): normalized p^alpha sampling distribution."""
    cnt = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n"))
    total = cnt.agg(F.sum(F.pow("n", alpha)).alias("z"))
    return cnt.crossJoin(F.broadcast(total)).select(
        stratum_col, "n", (F.pow("n", alpha) / F.col("z")).alias("weight")
    )
