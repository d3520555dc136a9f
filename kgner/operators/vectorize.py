"""Hashed TF-IDF document vectors, entirely JVM-side.

The hashing trick (feature = xxhash64(token) mod dim) gives fixed-width
vectors with no vocabulary pass — the scale-friendly vectorizer for feeding
kgner.operators.similarity (cosine top-k / near-dup) from raw text when no
learned embeddings exist.

Shape: one explode + two groupBys (term stats, then per-doc vector assembly
via map_from/aggregate) — no UDF, no driver-side vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_vectors(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    l2_normalize: bool = True,
) -> DataFrame:
    """-> (doc_id, vector array<double>): hashed TF-IDF.

    idf = ln(1 + N/df) over the hashed feature space; tf = in-doc count.
    With l2_normalize the output plugs straight into cosine similarity.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("feat", F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int"))

    n_docs = docs.count()
    df_feat = (
        toks.select("doc_id", "feat")
        .distinct()
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf", F.log(1.0 + F.lit(float(n_docs)) / F.col("df")))
    )
    weights = (
        toks.groupBy("doc_id", "feat")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(F.broadcast(df_feat), "feat")
        .withColumn("w", F.col("tf") * F.col("idf"))
    )
    # assemble dense array: map feat->w, then read positions 0..dim-1
    assembled = weights.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("feat"), F.col("w")))
        ).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)),
    )
    out = assembled.withColumn("vector", vec).drop("m")
    if l2_normalize:
        norm = F.sqrt(
            F.aggregate("vector", F.lit(0.0), lambda a, x: a + x * x)
        )
        out = out.withColumn(
            "vector",
            F.transform("vector", lambda x: x / F.greatest(norm, F.lit(1e-12))),
        )
    return out
