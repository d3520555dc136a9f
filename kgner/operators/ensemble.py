"""Span decoding + majority-vote ensembling as DataFrame ops.

Reference analogues (/root/reference):
- BIOES span decode       flair/data.py:455-532, ensemble_prediction.py:45-117
- vote count              ensemble_prediction.py:383-395 -> groupBy().count()
- greedy non-overlap pick ensemble_prediction.py:399-416 -> applyInPandas per
  sentence (sequential within a sentence, embarrassingly parallel across
  sentences — the natural grouped-map shape)

Scale notes: one shuffle to group votes by (url, sent_id, span), one grouped-
map shuffle by sentence. Vote counting is a map-side-combinable groupBy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from kgner.spanops import decode_spans, majority_vote

_SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("label", StringType()),
        ]
    )
)


@pandas_udf(_SPAN_TYPE)
def decode_spans_udf(tags: pd.Series) -> pd.Series:
    """array<string> BIO/BIOES tags -> array<struct<start,end,label>>."""
    return pd.Series(
        [
            [
                {"start": s, "end": e, "label": lbl}
                for s, e, lbl in decode_spans(list(t) if t is not None else [])
            ]
            for t in tags
        ]
    )


@pandas_udf(ArrayType(StringType()))
def iobes_udf(tags: pd.Series) -> pd.Series:
    """IOB2 -> IOBES conversion (flair/data.py:1144-1164), vectorized."""
    from kgner.spanops import iob_to_iobes

    return pd.Series([iob_to_iobes(list(t) if t is not None else []) for t in tags])


def decode_predictions(predictions: DataFrame) -> DataFrame:
    """model_predictions(model_id, url, sent_id, tags) -> one row per span."""
    return predictions.select(
        "model_id",
        "url",
        "sent_id",
        F.explode(decode_spans_udf(F.col("tags"))).alias("span"),
    ).select(
        "model_id",
        "url",
        "sent_id",
        F.col("span.start").alias("start"),
        F.col("span.end").alias("end"),
        F.col("span.label").alias("label"),
    )


ENSEMBLED_SCHEMA = "url string, sent_id int, start int, end int, label string"


def ensemble_votes(
    predictions: DataFrame, threshold_ratio: float = 0.5
) -> DataFrame:
    """predictions -> ensembled spans via majority vote.

    n_models is computed per sentence (countDistinct model_id) so partially-
    covered sentences use the correct denominator, as the reference's
    per-file accumulation does.
    """
    spans = decode_predictions(predictions)
    votes = spans.groupBy("url", "sent_id", "start", "end", "label").agg(
        F.count(F.lit(1)).cast("int").alias("votes")
    )
    n_models = predictions.groupBy("url", "sent_id").agg(
        F.countDistinct("model_id").cast("int").alias("n_models")
    )
    both = votes.join(n_models, ["url", "sent_id"])

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        nm = int(pdf["n_models"].iloc[0])
        sv = {
            (int(r.start), int(r.end), str(r.label)): int(r.votes)
            for r in pdf.itertuples()
        }
        chosen = majority_vote(sv, nm, threshold_ratio)
        return pd.DataFrame(
            {
                "url": pdf["url"].iloc[0],
                "sent_id": pdf["sent_id"].iloc[0],
                "start": pd.Series([s for s, _, _ in chosen], dtype="int32"),
                "end": pd.Series([e for _, e, _ in chosen], dtype="int32"),
                "label": pd.Series([l for _, _, l in chosen], dtype="object"),
            }
        )

    return both.groupBy("url", "sent_id").applyInPandas(pick, ENSEMBLED_SCHEMA)


def span_f1(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Chunk-level P/R/F1 per label + micro, conlleval semantics
    (/root/reference/conlleval_perl.py:207-350) as a pure DataFrame agg."""
    key = ["url", "sent_id", "start", "end", "label"]
    g = gold.select(*key).distinct()
    p = pred.select(*key).distinct()
    tp = g.join(p, key, "inner").groupBy("label").agg(F.count(F.lit(1)).alias("tp"))
    fp = p.join(g, key, "left_anti").groupBy("label").agg(
        F.count(F.lit(1)).alias("fp")
    )
    fn = g.join(p, key, "left_anti").groupBy("label").agg(
        F.count(F.lit(1)).alias("fn")
    )
    out = (
        tp.join(fp, "label", "outer")
        .join(fn, "label", "outer")
        .fillna(0, subset=["tp", "fp", "fn"])
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return out.select(
        "label",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )
