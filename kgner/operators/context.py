"""Context budget assembly (P-15): the reference's process_google
(/root/reference/kb/context_process.py:213-502) — greedily append ranked
retrieved contexts after the sentence until a subtoken budget (510) is
exhausted, separated by <EOS>.

Implemented JVM-side with F.aggregate over the ranked context array: the
accumulator carries (used_budget, kept_texts); each step appends the context
iff it still fits. No Python in the hot path; the inference UDF downstream
receives the already-concatenated text (the key simplification from
SURVEY.md §2 M-3 — context is explicit in the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgner.functions.text import BPE_ISH_PATTERN

EOS = "<EOS>"


def _subtok(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def assemble_context(
    sentences: DataFrame,
    retrievals: DataFrame,
    budget: int = 510,
    sent_key: str = "query_id",
    add_eos: bool = True,
    min_headroom: int = 10,
) -> DataFrame:
    """sentences(query_id, sentence) x retrievals(query_id, rank, sentence)
    -> (query_id, sentence, contexts array<string>, augmented string,
        used_subtokens int).

    Contexts are taken in rank order (W-2 semantics: rank-deduped, sorted)
    and greedily appended while the cumulative subtoken count — sentence
    included — stays within `budget`, with the reference's exact loop
    semantics (kb/context_process.py:395-446):

    - EARLY STOP: before each context, if ``budget - used < min_headroom``
      the loop breaks — later contexts are NOT considered (`:402`).
    - the fit check charges ``+1`` for the EOS separator iff ``add_eos``
      (`:434`, ``cxt_length + count + add_eos > length_limit -> continue``),
      but the ACCUMULATED count grows by the context length only (`:436`
      adds cxt_length, not cxt_length + add_eos).
    - an over-budget context is SKIPPED and the scan continues (a later,
      shorter context may still fit) unless the early stop fired first.
    """
    ranked = (
        retrievals.groupBy(sent_key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("rank"), F.col("sentence").alias("ctx")))
            ).alias("ranked")
        )
        .select(sent_key, F.col("ranked.ctx").alias("ctxs"))
    )
    joined = sentences.join(ranked, sent_key, "left").withColumn(
        "ctxs", F.coalesce(F.col("ctxs"), F.array().cast("array<string>"))
    )
    # accumulator: struct<used:int, kept:array<string>, stopped:boolean>
    eos_charge = 1 if add_eos else 0
    init = F.struct(
        _subtok(F.col("sentence")).cast("int").alias("used"),
        F.array().cast("array<string>").alias("kept"),
        F.lit(False).alias("stopped"),
    )

    def step(acc, c):
        stopped = acc["stopped"] | (F.lit(budget) - acc["used"] < F.lit(min_headroom))
        fits = acc["used"] + _subtok(c).cast("int") + F.lit(eos_charge) <= F.lit(budget)
        return (
            F.when(
                stopped,
                F.struct(
                    acc["used"].alias("used"),
                    acc["kept"].alias("kept"),
                    F.lit(True).alias("stopped"),
                ),
            )
            .when(
                fits,
                F.struct(
                    (acc["used"] + _subtok(c).cast("int")).cast("int").alias("used"),
                    F.array_append(acc["kept"], c).alias("kept"),
                    F.lit(False).alias("stopped"),
                ),
            )
            .otherwise(acc)
        )

    assembled = joined.withColumn("acc", F.aggregate("ctxs", init, step))
    return assembled.select(
        sent_key,
        "sentence",
        F.col("acc.kept").alias("contexts"),
        F.col("acc.used").alias("used_subtokens"),
    ).select(
        sent_key,
        "sentence",
        "contexts",
        F.when(
            F.size("contexts") > 0,
            F.concat(
                F.col("sentence"), F.lit(f" {EOS} "), F.concat_ws(f" {EOS} ", "contexts")
            ),
        )
        .otherwise(F.col("sentence"))
        .alias("augmented"),
        "used_subtokens",
    )
