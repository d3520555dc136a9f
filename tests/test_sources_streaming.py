"""Tests: CoNLL source/sink round-trip, streaming ingestion, iterative
retrieval, anchor splice round-trip."""

import pytest
from pyspark.sql import functions as F

from kgner.textops import splice_anchors, strip_anchors


CONLL = """# id 1
The DT X O
zqper0001 NN X B-PER
said VB X O

# id 2
In IN X O
zqloc0002 NN X B-LOC
city NN X I-LOC
"""


def test_conll_round_trip(spark, tmp_path):
    from kgner.sources.conll import read_conll, write_conll_lines

    p = tmp_path / "sample.conll"
    p.write_text(CONLL)
    df = read_conll(spark, str(p), {0: "tokens", 1: "pos", 2: "upos", 3: "ner"})
    rows = {r["sent_id"]: r for r in df.collect()}
    assert len(rows) == 2
    sents = sorted(
        (list(r["tokens"]), list(r["ner"])) for r in rows.values()
    )
    assert sents == [
        (["In", "zqloc0002", "city"], ["O", "B-LOC", "I-LOC"]),
        (["The", "zqper0001", "said"], ["O", "B-PER", "O"]),
    ]
    out = write_conll_lines(df, ["ner"]).collect()
    texts = sorted(r["conll"] for r in out)
    assert "zqper0001 B-PER" in texts[1]
    assert texts[0].endswith("\n")
    # max_len drop
    assert write_conll_lines(df, ["ner"], max_len=2).count() == 0


def test_anchor_splice_round_trip():
    text = "alpha beta gamma delta"
    anchors = [
        {"start": 0, "end": 5, "mention": "alpha", "target_title": "A"},
        {"start": 11, "end": 16, "mention": "gamma", "target_title": "G"},
        {"start": 99, "end": 105, "mention": "x", "target_title": "OOB"},  # dropped
        {"start": 17, "end": 400, "mention": "delta", "target_title": "D"},  # clamped
    ]
    marked = splice_anchors(text, anchors)
    assert marked == "<e:A>alpha</e> beta <e:G>gamma</e> <e:D>delta</e>"
    plain, back = strip_anchors(marked)
    assert plain == text
    assert [(a["start"], a["end"], a["target_title"]) for a in back] == [
        (0, 5, "A"),
        (11, 16, "G"),
        (17, 22, "D"),
    ]


def test_iterative_retrieval_boost_changes_ranking(spark, tables, fx):
    from kgner.operators.canonicalize import canonical_map
    from kgner.operators.iterative import iterative_retrieval
    from kgner.operators.kbbuild import alias_edges, kb_index, kb_sentences

    kbs = kb_sentences(tables["kb_pages"]).cache()
    postings, docs = kb_index(kbs)
    canon = canonical_map(
        alias_edges(tables["kb_pages"], tables["redirects"]),
        tables["kb_pages"].select("title"),
    )
    # query mentioning a known alias -> boost should exist for it
    alias = next(a for a in fx.alias_map if a.startswith("zqa"))
    queries = spark.createDataFrame(
        [(1, ["river", "stone", alias])], "query_id long, tokens array<string>"
    )
    r1, boost, r2 = iterative_retrieval(spark, queries, postings, docs, canon, k=5)
    b = boost.collect()
    assert len(b) == 1 and b[0]["query_id"] == 1
    canon_id = b[0]["entity"]
    # round-2 top hit should be a doc of the boosted entity's page
    top2 = r2.filter(F.col("rank") == 1).collect()[0]
    assert canon_id.split(" ")[0] in top2["title"].lower() or top2["score"] >= (
        r1.filter(F.col("rank") == 1).collect()[0]["score"]
    )


def test_streaming_mention_counts(spark, tmp_path):
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.streaming import stream_mention_counts

    fx = build_fixtures(n_entities=10, n_pages=12, giant_pages=0)
    t = to_spark(spark, fx)
    pages_dir = str(tmp_path / "pages_in")
    t["pages"].write.mode("overwrite").parquet(pages_dir)
    aliases = spark.createDataFrame(
        [(a, c) for a, c in fx.alias_map.items()],
        "alias_norm string, canonical_id string",
    )
    out_dir = str(tmp_path / "counts_out")
    q = stream_mention_counts(
        spark, pages_dir, aliases, str(tmp_path / "ckpt"), out_dir
    )
    q.awaitTermination(120)
    assert q.exception() is None
    counts = (
        spark.read.parquet(out_dir).groupBy("entity_id").agg(F.sum("n").alias("n"))
    )
    got = {r["entity_id"]: r["n"] for r in counts.collect()}
    # must equal the batch path's counts
    from kgner.functions.text import with_sentences
    from kgner.operators.mentions import detect_mentions

    batch = (
        detect_mentions(spark, with_sentences(t["pages"]), aliases)
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["entity_id"]: r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_first_seen_dedup_across_batches(spark, tmp_path):
    """Stateful cross-batch dedup: a fingerprint re-arriving in a later
    micro-batch emits nothing; each fingerprint surfaces exactly once with
    the min doc_id of its first-seen batch — matching batch exact_dedup's
    fingerprint set."""
    from pyspark.sql import functions as F

    from kgner.operators.dedup import exact_dedup
    from kgner.streaming import stream_first_seen_docs

    docs_dir = str(tmp_path / "docs_in")
    schema = "doc_id long, text string"
    wave1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha   beta")],  # 3 dups 1
        schema,
    )
    wave2 = spark.createDataFrame(
        [(10, "ALPHA beta"), (11, "epsilon zeta")],  # 10 dups wave1's alpha
        schema,
    )
    wave1.coalesce(1).write.mode("append").parquet(docs_dir)
    wave2.coalesce(1).write.mode("append").parquet(docs_dir)

    q = stream_first_seen_docs(
        spark,
        docs_dir,
        schema,
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {r.fingerprint: r.doc_id for r in out.collect()}

    batch = exact_dedup(wave1.unionByName(wave2))
    want_fps = {r.fingerprint for r in batch.collect()}
    assert set(rows) == want_fps          # one row per distinct fingerprint
    assert len(rows) == 3                 # alpha-beta, gamma-delta, epsilon-zeta
    # each fingerprint emitted exactly once with the min doc_id of whichever
    # micro-batch the file source delivered first (file order between the
    # two waves is an mtime tiebreak, not guaranteed) — the alpha-beta
    # fingerprint surfaces as 1 (wave1 first) or 10 (wave2 first), never both
    vals = sorted(rows.values())
    assert vals in ([1, 2, 11], [2, 10, 11])
