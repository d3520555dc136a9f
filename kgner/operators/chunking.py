"""Sequence chunking + document grouping operators.

- chunk_by_subtokens: split over-budget token sequences into chunks
  (reference: chunk_sentence, /root/reference/flair/data.py:704-715 and the
  EOS-chunked inference path flair/trainers/distillation_trainer.py:675-690).
  JVM-side: a sequence of chunk indices -> slice -> posexplode; no Python.
- assign_doc_ids: group sentences into documents by boundary markers
  (reference: -DOCSTART- doc assignment,
  /root/reference/flair/trainers/distillation_trainer.py:655-674): cumulative
  sum of the boundary flag over a per-file window, then doc_pos numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk_by_subtokens(
    df: DataFrame,
    budget: int,
    tokens_col: str = "tokens",
    stride: int = 0,
) -> DataFrame:
    """Explode rows whose token count exceeds `budget` into chunks of at
    most `budget` tokens: every non-token column passes through unchanged
    and (chunk_id, chunk_tokens) are added.

    stride=0 (default): consecutive non-overlapping chunks (the reference's
    chunk_sentence, flair/data.py:704-715). stride>0: OVERLAPPING windows
    advancing by budget - stride with the reference's encode_plus window
    semantics (flair/embeddings.py:3202-3229) — every chunk but the last has
    exactly `budget` tokens and consecutive chunks share `stride` tokens;
    the numpy twin is kgner.operators.align.stride_windows (whose seam-cut
    reconstruction consumes these windows). All JVM: sequence of window
    starts -> slice -> posexplode; no Python.

    Order within the original row is preserved by chunk_id; rows within
    budget come through as a single chunk 0 — so downstream inference UDFs
    see bounded inputs regardless of input length.
    """
    if not 0 <= stride < budget:
        raise ValueError(f"need 0 <= stride < budget, got {stride}, {budget}")
    toks = F.col(tokens_col)
    advance = budget - stride
    # number of windows over n tokens: 1 + ceil(max(n - budget, 0) / advance)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.size(toks) - F.lit(budget), F.lit(0)) / F.lit(advance)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * advance + 1, budget),
    )
    # keep every non-token column (callers' labels/lang/etc. survive)
    passthrough = [c for c in df.columns if c != tokens_col]
    return df.select(
        *passthrough,
        F.posexplode(chunks).alias("chunk_id", "chunk_tokens"),
    )


def assign_doc_ids(
    sentences: DataFrame,
    boundary_col: str = "is_docstart",
    file_col: str = "file",
    order_col: str = "sent_id",
) -> DataFrame:
    """Add doc_id (cumulative boundary count per file) and doc_pos (position
    of the sentence inside its document, 0-based, boundaries excluded)."""
    w = Window.partitionBy(file_col).orderBy(order_col)
    out = sentences.withColumn(
        "doc_id", F.sum(F.col(boundary_col).cast("int")).over(w)
    )
    wd = Window.partitionBy(file_col, "doc_id").orderBy(order_col)
    return (
        out.filter(~F.col(boundary_col))
        .withColumn("doc_pos", F.row_number().over(wd) - 1)
    )
