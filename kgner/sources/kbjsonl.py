"""KB JSONL source (SURVEY §2 S-4): the reference streams `{lan}_all.jsonl`
records `{title, p_id, s_id, sentence, paragraph, url}` in 10k batches into
ES (/root/reference/kb/build_kb.py:41-55; record shape kb/parse_text.py:81).

Here: a schema'd spark.read.json — explicit StructType (never inferred, per
the data-model policy in SURVEY §1.2); batching is Spark's own partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

KB_JSONL_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("p_id", IntegerType()),
        StructField("s_id", IntegerType()),
        StructField("sentence", StringType()),
        StructField("paragraph", StringType()),
        StructField("url", StringType()),
    ]
)


def read_kb_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL -> kb_sentences-shaped DataFrame (malformed rows dropped, as the
    reference's bulk loader tracks-and-skips failed batches)."""
    return (
        spark.read.schema(KB_JSONL_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def write_kb_jsonl(df: DataFrame, path: str) -> None:
    """kb_sentences -> JSONL (round-trip sink for oracle-diff tests)."""
    df.select("title", "p_id", "s_id", "sentence", "paragraph", "url").write.mode(
        "overwrite"
    ).json(path)
