"""Triple materialization: mentions / links_to / co_occurs_with.

The product table (SURVEY.md §7.1): triples(subj, pred, obj, url, warc_ts?).
At cluster scale this is written partitioned by bucket(subj) so downstream
graph queries co-locate by subject.

Scale notes: co-occurrence is a self-join per sentence — bounded because it
runs on the per-sentence DISTINCT entity set (collect_set then explode of
ordered pairs inside the row via array ops, no shuffle-side blowup on hot
sentences beyond the set size itself, which the filter caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ENTITIES_PER_SENT = 64  # giant-page safety cap for the pair expansion


def mention_triples(mentions: DataFrame) -> DataFrame:
    """(url, "mentions", entity) — one per distinct (url, entity)."""
    return (
        mentions.select(
            F.col("url").alias("subj"),
            F.lit("mentions").alias("pred"),
            F.col("entity_id").alias("obj"),
            "url",
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )


def cooccurrence_triples(mentions: DataFrame) -> DataFrame:
    """(a, "co_occurs_with", b) for entity pairs in the same sentence, a<b.

    Built row-local: collect_set entities per sentence, sort, expand ordered
    pairs with array ops — the pair expansion never shuffles.
    """
    ents = (
        mentions.groupBy("url", "sent_id")
        .agg(F.array_sort(F.collect_set("entity_id")).alias("ents"))
        .filter((F.size("ents") >= 2) & (F.size("ents") <= MAX_ENTITIES_PER_SENT))
    )
    pairs = ents.select(
        "url",
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ents"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("ents"), i + 2, F.size(F.col("ents"))
                        ),
                        lambda b: F.struct(a.alias("subj"), b.alias("obj")),
                    ),
                )
            )
        ).alias("p"),
    )
    return (
        pairs.select(
            F.col("p.subj").alias("subj"),
            F.lit("co_occurs_with").alias("pred"),
            F.col("p.obj").alias("obj"),
            "url",
        )
        .dropDuplicates(["subj", "pred", "obj", "url"])
    )


def link_triples(kb_sents: DataFrame, canon: DataFrame) -> DataFrame:
    """KB anchors -> (page_entity, "links_to", target_entity).

    canon: (alias_norm, canonical_id) — broadcast (dimension-sized).
    Mirrors the page->anchor edges of /root/reference/kb/parse_text.py:53-71.
    """
    anchors = kb_sents.select(
        "title", "url", F.explode("anchors").alias("a")
    ).select(
        "title",
        "url",
        F.lower(F.col("a.target_title")).alias("target_norm"),
    )
    c = F.broadcast(canon)
    return (
        anchors.join(
            c.withColumnRenamed("alias_norm", "title_norm").withColumnRenamed(
                "canonical_id", "subj"
            ),
            F.lower(F.col("title")) == F.col("title_norm"),
        )
        .join(
            c.withColumnRenamed("canonical_id", "obj"),
            F.col("target_norm") == F.col("alias_norm"),
            "left",
        )
        .select(
            "subj",
            F.lit("links_to").alias("pred"),
            F.coalesce("obj", "target_norm").alias("obj"),
            "url",
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )


def all_triples(
    mentions: DataFrame, kb_sents: DataFrame, canon: DataFrame
) -> DataFrame:
    return (
        mention_triples(mentions)
        .unionByName(cooccurrence_triples(mentions))
        .unionByName(link_triples(kb_sents, canon))
    )
