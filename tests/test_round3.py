"""Round-3 additions: punctuation-aware highlight, context-tag stripping
(<EOS>/S-X truncation before ensembling), conlleval remove_x, multiplicative
title-field BM25 boost, and the file-loaded embedder seam."""

import pytest
from pyspark.sql import functions as F


# --- punctuation-aware ES highlight ------------------------------------------

def test_highlight_marks_punctuation_adjacent_tokens(spark):
    """ES marks 'Paris,' when term 'paris' scored (the analyzer strips the
    comma); highlight_col must wrap the core and re-attach the punctuation
    (ADVICE r2: kgner/operators/retrieval.py highlight gap)."""
    from kgner.operators.retrieval import highlight_col

    df = spark.createDataFrame(
        [
            ("Paris, is nice (Paris) !!", ["paris", "nice"]),
            ("all !! punct ..", ["punct"]),
            ("term equals, token", ["equals,"]),  # exact-token match kept
        ],
        "sentence string, terms array<string>",
    )
    got = [
        r.h
        for r in df.select(
            highlight_col(F.col("sentence"), F.col("terms")).alias("h")
        ).collect()
    ]
    assert got[0] == "<hit>Paris</hit>, is <hit>nice</hit> (<hit>Paris</hit>) !!"
    assert got[1] == "all !! <hit>punct</hit> .."
    assert got[2] == "term <hit>equals,</hit> token"


# --- recorded-fixture real-model seam (M-1) -------------------------------------

def test_file_loaded_embedder_drives_windowed_crf(spark):
    """The one-function model swap documented at kgner/operators/align.py:
    a FROZEN weight file (tests/fixtures/tiny_embedder.npz) loaded through
    load_npz_embedder has the exact embed_fn(subtoken batch) -> (n, dim)
    call shape an ONNX/torch runtime would have; the full windowed M-1/M-2
    path (subtokenize -> stride windows -> seam-cut reconstruct -> pool ->
    project -> Viterbi) runs unchanged on top of it and decodes the
    gazetteer islands."""
    import os

    import numpy as np

    from kgner.operators.ensemble import decode_spans_udf
    from kgner.operators.inference import load_npz_embedder, tag_with_crf

    path = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_embedder.npz")
    embed = load_npz_embedder(path)
    # direct call-shape check: batch of subtoken strings -> (n, dim)
    out = embed(["spark", "unknownword", "join"])
    assert out.shape == (3, 2)
    assert out[0].tolist() == [1.0, 0.0]  # in-vocab entity piece
    assert out[1].tolist() == [0.0, 1.0]  # OOV -> oov row

    rows = [
        ("d1", 0, "spark join runs on the customer table every day".split()),
        ("d2", 0, "nothing relevant here at all in this one".split()),
        ("d3", 0, "window".split()),
    ]
    sents = spark.createDataFrame(
        [(u, s, t, len(t)) for u, s, t in rows],
        "url string, sent_id int, tokens array<string>, subtoken_len int",
    )
    # project [ent, other] -> emissions [O, B-ENT, I-ENT]; transitions make
    # runs decode as B I I... (START/O -> I forbidden, B/I -> I rewarded)
    weights = np.array([[0.0, 3.0, 3.0], [3.0, 0.0, 0.0]])
    trans = np.zeros((5, 5))
    trans[3, 2] = trans[0, 2] = -10.0  # START -> I, O -> I
    trans[1, 2] = trans[2, 2] = 2.0  # B -> I, I -> I
    tagged = tag_with_crf(
        sents, weights, trans, ["O", "B-ENT", "I-ENT"],
        embed_fn=embed, max_window=4, stride=2,
    )
    spans = {
        (r.url, r.span.start, r.span.end)
        for r in tagged.select(
            "url", F.explode(decode_spans_udf("tags")).alias("span")
        ).collect()
    }
    assert spans == {("d1", 0, 2), ("d1", 5, 7), ("d3", 0, 1)}


# --- multiplicative title-field BM25 boost -------------------------------------

def test_bm25_topk_title_boost_matches_pure_oracle(spark):
    """bm25_topk's entity->title boost is ES-exact (generate_data.py:52-55):
    score = text_bm25 + 2.0 x TITLE-FIELD bm25 — verified against the pure
    bm25_rank oracle to 1e-6."""
    from kgner.bm25 import bm25_rank
    from kgner.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, 4, "paris is a city", "paris city", "u0"),
            (1, 3, "rome is old", "rome city", "u1"),
            (2, 5, "guide to paris streets maps", "paris guide", "u2"),
        ],
        "doc_id long, len long, sentence string, title string, url string",
    )
    postings = spark.createDataFrame(
        [("paris", 0, 1), ("city", 0, 1), ("rome", 1, 1), ("old", 1, 1),
         ("paris", 2, 1), ("guide", 2, 1)],
        "term string, doc_id long, tf long",
    )
    queries = spark.createDataFrame(
        [(7, ["paris", "city"])], "query_id long, tokens array<string>"
    )
    boost = spark.createDataFrame([(7, "paris")], "query_id long, entity string")
    got = {
        r.doc_id: r.score
        for r in bm25_topk(queries, postings, docs, k=5, boost_entities=boost).collect()
    }
    want = dict(
        bm25_rank(
            ["paris", "city"],
            {"paris": {0: 1, 2: 1}, "city": {0: 1}, "rome": {1: 1},
             "old": {1: 1}, "guide": {2: 1}},
            {0: 4, 1: 3, 2: 5},
            k=5,
            title_tokens={0: ["paris", "city"], 1: ["rome", "city"],
                          2: ["paris", "guide"]},
            boost_terms=["paris"],
        )
    )
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-6, d


def test_bm25_topk_with_hits_false_same_scores(spark):
    """with_hits=False is a pure projection knob: identical ranks/scores,
    no matched_terms/highlight columns (and no collect_set in the plan)."""
    from kgner.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(0, 3, "a b c", "t", "u"), (1, 2, "a d", "t", "u")],
        "doc_id long, len long, sentence string, title string, url string",
    )
    postings = spark.createDataFrame(
        [("a", 0, 1), ("b", 0, 1), ("c", 0, 1), ("a", 1, 1), ("d", 1, 1)],
        "term string, doc_id long, tf long",
    )
    queries = spark.createDataFrame(
        [(9, ["a", "b"])], "query_id long, tokens array<string>"
    )
    full = bm25_topk(queries, postings, docs, k=5)
    lean = bm25_topk(queries, postings, docs, k=5, with_hits=False)
    assert "matched_terms" not in lean.columns and "highlight" not in lean.columns
    f = {(r.doc_id, r.rank): round(r.score, 9) for r in full.collect()}
    l = {(r.doc_id, r.rank): round(r.score, 9) for r in lean.collect()}
    assert f == l
    assert "collect_set" not in lean._jdf.queryExecution().executedPlan().toString()


# --- <EOS>/S-X context strip + conlleval remove_x -----------------------------

def test_strip_context_tags_cuts_at_eos_or_sx(spark):
    """ensemble_prediction.py:356-361: truncate at the FIRST <EOS> token or
    gold S-X filler, whichever comes first."""
    from kgner.operators.ensemble import strip_context_tags

    df = spark.createDataFrame(
        [
            # EOS first
            (["a", "b", "<EOS>", "c"], ["O", "O", "O", "B-ENT"],
             ["O", "O", "O", "S-X"]),
            # S-X first (before any EOS)
            (["a", "b", "c", "<EOS>"], ["B-ENT", "O", "O", "O"],
             ["O", "S-X", "S-X", "S-X"]),
            # no cut condition: stream untouched
            (["a", "b"], ["O", "B-ENT"], ["O", "O"]),
            # EOS at position 1: everything stripped
            (["<EOS>", "x"], ["B-ENT", "I-ENT"], ["S-X", "S-X"]),
        ],
        "tokens array<string>, tags array<string>, gold_tags array<string>",
    )
    got = strip_context_tags(df, gold_col="gold_tags").collect()
    assert (got[0].tokens, got[0].tags, got[0].gold_tags) == (
        ["a", "b"], ["O", "O"], ["O", "O"])
    assert (got[1].tokens, got[1].tags) == (["a"], ["B-ENT"])
    assert got[2].tokens == ["a", "b"] and got[2].tags == ["O", "B-ENT"]
    assert got[3].tokens == [] and got[3].tags == []


def test_strip_context_tags_gold_only_without_tokens(spark):
    """The reference strips on gold S-X alone (ensemble_prediction.py:356-361
    — either condition fires); predictions without a token stream must
    still truncate at the filler."""
    from kgner.operators.ensemble import strip_context_tags

    df = spark.createDataFrame(
        [(["O", "B-ENT", "B-ENT"], ["O", "S-X", "S-X"])],
        "tags array<string>, gold_tags array<string>",
    )
    r = strip_context_tags(df, tokens_col=None, gold_col="gold_tags").head()
    assert r.tags == ["O"] and r.gold_tags == ["O"]


def test_span_f1_mention_oracle_zero_rows_on_gaz_free_data(spark, tmp_path):
    """Gaz-free corpus: the Spark query returns zero rows and the oracle's
    ungrouped aggregate must too (HAVING guard), or the driver's row-count
    compare fails on 'nothing found'."""
    import duckdb

    from kgner.queries import ORACLES, q_span_f1_mention

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(0, "nothing relevant at all"), (1, "more plain words")],
        "doc_id long, text string",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    assert q_span_f1_mention(spark, sf_dir).count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    assert con.execute(ORACLES["span_f1_mention"]).fetchall() == []


def test_strip_context_tags_eos_only_without_gold(spark):
    from kgner.operators.ensemble import strip_context_tags

    df = spark.createDataFrame(
        [(["x", "<EOS>", "y"], ["B-ENT", "O", "B-ENT"])],
        "tokens array<string>, tags array<string>",
    )
    r = strip_context_tags(df).head()
    assert r.tokens == ["x"] and r.tags == ["B-ENT"]


def test_strip_and_remove_x_null_and_empty_rows(spark):
    """Null and empty token streams pass through unchanged (null-propagating
    array expressions) — junk rows can't crash the strip path."""
    from kgner.operators.ensemble import remove_x_tokens, strip_context_tags

    df = spark.createDataFrame(
        [(None, None, None), ([], [], [])],
        "tokens array<string>, tags array<string>, gold_tags array<string>",
    )
    for out in (
        strip_context_tags(df, gold_col="gold_tags"),
        remove_x_tokens(df, gold_col="gold_tags", cols=("tokens", "tags")),
    ):
        rows = out.collect()
        assert rows[0].tokens is None and rows[0].tags is None
        assert rows[1].tokens == [] and rows[1].tags == []


def test_remove_x_tokens_renumbers_like_conlleval(spark):
    """conlleval_perl.py:244-246: gold-X token lines are skipped entirely —
    parallel streams shrink and positions renumber."""
    from kgner.operators.ensemble import remove_x_tokens

    df = spark.createDataFrame(
        [
            (
                ["a", "pad", "b", "c", "pad"],
                ["O", "S-X", "B-ENT", "I-ENT", "B-X"],
                ["O", "B-ENT", "B-ENT", "I-ENT", "O"],
            )
        ],
        "tokens array<string>, gold_tags array<string>, tags array<string>",
    )
    r = remove_x_tokens(df, gold_col="gold_tags", cols=("tokens", "tags")).head()
    assert r.tokens == ["a", "b", "c"]
    assert r.gold_tags == ["O", "B-ENT", "I-ENT"]
    # the pred B-ENT that sat on the removed filler position vanishes with it
    assert r.tags == ["O", "B-ENT", "I-ENT"]


def test_span_f1_remove_x_flag(spark):
    from kgner.operators.ensemble import span_f1

    gold = spark.createDataFrame(
        [("u", 0, 0, 2, "PER"), ("u", 0, 5, 6, "X")],
        "url string, sent_id int, start int, end int, label string",
    )
    pred = spark.createDataFrame(
        [("u", 0, 0, 2, "PER"), ("u", 0, 5, 6, "X"), ("u", 0, 8, 9, "X")],
        "url string, sent_id int, start int, end int, label string",
    )
    with_x = {r.label: (r.tp, r.fp, r.fn) for r in span_f1(gold, pred).collect()}
    assert with_x["X"] == (1, 1, 0)
    no_x = {r.label: (r.tp, r.fp, r.fn)
            for r in span_f1(gold, pred, remove_x=True).collect()}
    assert "X" not in no_x
    assert no_x["PER"] == (1, 0, 0)


def test_span_f1_mention_mode(spark):
    """conlleval --mention (conlleval_perl.py:247-251): labels collapse to
    ENT so boundary-only matches score; remove_x runs FIRST (perl line
    order), so an X span never sneaks in as an ENT match."""
    from kgner.operators.ensemble import span_f1

    gold = spark.createDataFrame(
        [("u", 0, 0, 2, "PER"), ("u", 0, 4, 5, "LOC"), ("u", 0, 8, 9, "X")],
        "url string, sent_id int, start int, end int, label string",
    )
    pred = spark.createDataFrame(
        # right boundaries, wrong type for the first; X predicted where gold X
        [("u", 0, 0, 2, "ORG"), ("u", 0, 4, 5, "LOC"), ("u", 0, 8, 9, "X")],
        "url string, sent_id int, start int, end int, label string",
    )
    strict = {r.label: (r.tp, r.fp, r.fn) for r in span_f1(gold, pred).collect()}
    assert strict["PER"] == (0, 0, 1) and strict["ORG"] == (0, 1, 0)
    m = {r.label: (r.tp, r.fp, r.fn)
         for r in span_f1(gold, pred, mention_only=True).collect()}
    assert m == {"ENT": (3, 0, 0)}  # X collapses to ENT when not removed
    mx = {r.label: (r.tp, r.fp, r.fn)
          for r in span_f1(gold, pred, remove_x=True, mention_only=True).collect()}
    assert mx == {"ENT": (2, 0, 0)}  # remove_x applied before the collapse


def test_augmented_inference_e2e(spark):
    """E2E over AUGMENTED sentences: assemble_context -> CRF tags the whole
    augmented stream (context region included) -> strip_context_tags ->
    ensemble_votes -> span_f1(remove_x=True) gives P = R = 1.0 against the
    original-region gold; without the strip the same pipeline yields phantom
    context spans (precision < 1)."""
    import numpy as np

    from kgner.operators.context import assemble_context
    from kgner.operators.ensemble import (
        decode_spans_udf,
        ensemble_votes,
        span_f1,
        strip_context_tags,
    )
    from kgner.operators.inference import tag_with_crf

    sents = spark.createDataFrame(
        [(1, "alice met bob"), (2, "nobody here"), (3, "carol alone")],
        "query_id int, sentence string",
    )
    # retrieved contexts are FULL of entity tokens the model will tag
    ctxs = spark.createDataFrame(
        [(q, r, "alice and bob and carol") for q in (1, 2, 3) for r in (1, 2)],
        "query_id int, rank int, sentence string",
    )
    aug = assemble_context(sents, ctxs, budget=500)
    base = (
        aug.select(
            F.col("query_id").cast("string").alias("url"),
            F.lit(0).cast("int").alias("sent_id"),
            F.split("augmented", " ").alias("tokens"),
            F.size(F.split("sentence", " ")).alias("sent_len"),
        )
        .withColumn(
            "gold_tags",
            F.transform(
                "tokens",
                lambda _, i: F.when(i < F.col("sent_len"), "O").otherwise("S-X"),
            ),
        )
        .withColumn("subtoken_len", F.size("tokens"))
    )
    names = {"alice", "bob", "carol"}
    tagset = ["O", "B-PER", "I-PER"]

    def embed(tokens):
        out = np.zeros((len(tokens), 3))
        for i, t in enumerate(tokens):
            out[i, 1 if t in names else 0] = 5.0
        return out

    trans = np.zeros((5, 5))
    trans[0, 2] = trans[3, 2] = -10.0
    tagged = tag_with_crf(base, np.eye(3), trans, tagset, embed_fn=embed).join(
        base.select("url", "sent_id", "tokens", "gold_tags"), ["url", "sent_id"]
    )

    def spans_of(preds):
        three = (
            preds.withColumn("model_id", F.lit(1))
            .unionByName(preds.withColumn("model_id", F.lit(2)))
            .unionByName(preds.withColumn("model_id", F.lit(3)))
        )
        return ensemble_votes(three.select("model_id", "url", "sent_id", "tags"))

    stripped = spans_of(strip_context_tags(tagged, gold_col="gold_tags"))
    gold = spark.createDataFrame(
        [("1", 0, 0, 1, "PER"), ("1", 0, 2, 3, "PER"), ("3", 0, 0, 1, "PER")],
        "url string, sent_id int, start int, end int, label string",
    )
    m = {r.label: r for r in span_f1(gold, stripped, remove_x=True).collect()}
    assert m["PER"].precision == 1.0 and m["PER"].recall == 1.0

    # negative control: skipping the strip leaks context-region spans
    leaky = spans_of(tagged)
    m2 = {r.label: r for r in span_f1(gold, leaky, remove_x=True).collect()}
    assert m2["PER"].fp > 0 and m2["PER"].precision < 1.0


def test_contextual_spans_handles_leading_whitespace(spark, tmp_path):
    """A document whose text begins with non-space whitespace produces a
    leading '' token under the oracle's \\s+ split; the query must keep the
    same position numbering (regression: trim + \\s+ on the augmented string
    dropped that token and shifted every span one left)."""
    import duckdb

    from kgner.queries import ORACLES, q_contextual_spans

    rows = [
        (0, "\tspark is here"),
        (1, "customer table appears with spark stuff inside this text"),
        (2, "plain filler words only here"),
        (3, "join window spark"),
        (4, "  two leading spaces spark"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = sorted(
        (r.doc_id, r.start_pos, r.span_len)
        for r in q_contextual_spans(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES["contextual_spans"]).fetchall())
    assert got == want
    # the leading-tab doc's island sits at ord 2 (after the '' token)
    assert (0, 2, 1) in got


def test_highlight_roundtrips_unmatched_text(spark):
    from kgner.operators.retrieval import highlight_col

    df = spark.createDataFrame(
        [("double  space and, no match", ["absent"])],
        "sentence string, terms array<string>",
    )
    r = df.select(highlight_col(F.col("sentence"), F.col("terms")).alias("h")).head()
    assert r.h == "double  space and, no match"
