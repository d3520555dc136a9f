"""CoNLL column-file source/sink (SURVEY §2 S-6/S-7).

Reference semantics (/root/reference/flair/datasets.py:852-956, writer
kb/context_process.py:90-102): blank-line-delimited sentences, whitespace-
split columns, `# id`-prefixed comment lines skipped, latin-1 fallback,
sentences longer than max_len dropped at write time.

Spark-first design: spark.read.text gives (line) rows with no order
guarantee across partitions, so we read WITH the file offset — each input
file is one document; sentence ids come from a cumulative blank-line count
windowed per file. For multi-TB CoNLL corpora this scans in parallel per
file split while preserving within-file sentence order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_COLUMNS = {0: "token", 1: "pos", 2: "upos", 3: "ner"}


def read_conll(
    spark: SparkSession,
    path: str,
    column_format: dict[int, str] | None = None,
    comment_prefix: str = "# id",
    drop_docstart: bool = False,
) -> DataFrame:
    """-> (file, sent_id, tokens array<string>, <layer> array<string>...).

    Mirrors ColumnDataset parsing: re.split('\\s+') fields, comment filter,
    blank-line sentence boundaries (flair/datasets.py:905-956).
    """
    cols = column_format or DEFAULT_COLUMNS
    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_id"),
            F.col("value").alias("line"),
        )
    )
    w = Window.partitionBy("file").orderBy("line_id")
    marked = (
        lines.withColumn("is_blank", (F.trim("line") == "").cast("int"))
        .withColumn("sent_id", F.sum("is_blank").over(w))
        .filter((F.col("is_blank") == 0) & ~F.col("line").startswith(comment_prefix))
        .withColumn("fields", F.split(F.trim("line"), r"\s+"))
    )
    aggs = [
        F.collect_list(F.col("fields").getItem(i)).alias(name)
        for i, name in sorted(cols.items())
    ]
    # collect_list within groupBy preserves the sort only with a window sort:
    grouped = (
        marked.repartition("file")
        .sortWithinPartitions("file", "line_id")
        .groupBy("file", "sent_id")
        .agg(*aggs)
    )
    out = (
        grouped.withColumnRenamed(cols[0], "tokens")
        if cols[0] != "tokens"
        else grouped
    )
    if drop_docstart:
        # P-16: drop -DOCSTART- pseudo-sentences
        # (/root/reference/flair/trainers/finetune_trainer.py:124-147)
        out = out.filter(
            F.element_at(F.col("tokens"), 1) != F.lit("-DOCSTART-")
        )
    return out


def write_conll_lines(
    df: DataFrame, layers: list[str], max_len: int = 510
) -> DataFrame:
    """sentences -> one string per sentence in CoNLL format (token per line,
    blank line after), dropping sentences over max_len tokens (P-6 /
    kb/context_process.py:94-97). Returns (file, sent_id, conll string);
    callers write with spark.write.text after ordering."""
    zipped = F.arrays_zip(*[F.col(c) for c in ["tokens", *layers]])
    line = F.concat_ws(
        "\n",
        F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s[c] for c in ["tokens", *layers]]),
        ),
    )
    return (
        df.filter(F.size("tokens") <= max_len)
        .select("file", "sent_id", F.concat(line, F.lit("\n")).alias("conll"))
    )
