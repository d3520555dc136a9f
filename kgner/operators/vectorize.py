"""Hashed TF-IDF document vectors, entirely JVM-side.

The hashing trick (feature = xxhash64(token) mod dim) gives fixed-width
vectors with no vocabulary pass — the scale-friendly vectorizer for feeding
kgner.operators.similarity (cosine top-k / near-dup) from raw text when no
learned embeddings exist.

Shape: one explode + two groupBys (term stats, then per-doc vector assembly
via map_from/aggregate) — no UDF, no driver-side vocab.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tfidf_vectors(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    l2_normalize: bool = True,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """-> (doc_id, vector array<double>): hashed TF-IDF.

    idf = ln(1 + N/df) over the hashed feature space; tf = in-doc count.
    With l2_normalize the output plugs straight into cosine similarity.
    hash_fn: token Column -> integerish Column; xxhash64 (default) is the
    fast production hash, kgner.functions.hashing.stable_hash64_u the
    cross-engine-checkable one.
    """
    from kgner.functions.text import tokens_col

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"),
        )
        # F.split of a trimmed empty string yields [''] — drop the phantom
        # token so empty/whitespace-only docs really get the zero vector
        .filter(F.col("tok") != "")
        .withColumn("feat", F.pmod(hash_fn(F.col("tok")), F.lit(dim)).cast("int"))
    )

    n_docs = docs.count()
    # ONE tokenize+explode: tf is the only shuffle over raw tokens;
    # per-feature df derives from tf's (already grouped) output.
    tf = (
        toks.groupBy("doc_id", "feat")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_feat = (
        tf.groupBy("feat")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf", F.log(1.0 + F.lit(float(n_docs)) / F.col("df")))
    )
    weights = tf.join(F.broadcast(df_feat), "feat").withColumn(
        "w", F.col("tf") * F.col("idf")
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
    # docs with NULL/empty text get an explicit zero vector (silently losing
    # ids would skew downstream joins and dedup decisions)
    zero = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(out, "doc_id", "left")
        .withColumn("vector", F.coalesce("vector", zero))
    )
