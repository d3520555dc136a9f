"""Round-4 additions: per-language retrieval scoping (the reference's
one-ES-index-per-language layout, kb/build_kb.py:17-22 /
kb/generate_data.py:21-24), ES per-field docCount for the title boost,
remove_x empty-gold guard, and the max_df_ratio pipeline knob."""

from pyspark.sql import functions as F


def _mk_retrieval_tables(spark):
    """Two-language corpus where `paris` and `guide` occur in BOTH languages,
    so per-language df differs from global df for every shared term."""
    docs = spark.createDataFrame(
        [
            (0, 4, "paris is a city", "paris city", "u0", "en"),
            (1, 2, "paris guide", "", "u1", "en"),
            (2, 2, "paris chengshi", "paris guide", "u2", "zh"),
            (3, 3, "chengshi guide paris", None, "u3", "zh"),
        ],
        "doc_id long, len long, sentence string, title string, url string, lang string",
    )
    postings = spark.createDataFrame(
        [
            ("paris", 0, 1, "en"), ("is", 0, 1, "en"), ("a", 0, 1, "en"),
            ("city", 0, 1, "en"),
            ("paris", 1, 1, "en"), ("guide", 1, 1, "en"),
            ("paris", 2, 1, "zh"), ("chengshi", 2, 1, "zh"),
            ("chengshi", 3, 1, "zh"), ("guide", 3, 1, "zh"), ("paris", 3, 1, "zh"),
        ],
        "term string, doc_id long, tf long, lang string",
    )
    queries = spark.createDataFrame(
        [(7, ["paris", "city"], "en"), (8, ["paris", "chengshi"], "zh")],
        "query_id long, tokens array<string>, lang string",
    )
    return queries, postings, docs


def test_bm25_topk_lang_scoped_matches_per_lang_oracle(spark):
    """lang_col scoping = run bm25_rank independently per language with that
    language's postings/lens only (per-index df, n_docs, avg_len)."""
    from kgner.bm25 import bm25_rank
    from kgner.operators.retrieval import bm25_topk

    queries, postings, docs = _mk_retrieval_tables(spark)
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(queries, postings, docs, k=5, lang_col="lang").collect()
    }
    en_postings = {"paris": {0: 1, 1: 1}, "is": {0: 1}, "a": {0: 1},
                   "city": {0: 1}, "guide": {1: 1}}
    zh_postings = {"paris": {2: 1, 3: 1}, "chengshi": {2: 1, 3: 1},
                   "guide": {3: 1}}
    want = {}
    for qid, terms, plist, lens in [
        (7, ["paris", "city"], en_postings, {0: 4, 1: 2}),
        (8, ["paris", "chengshi"], zh_postings, {2: 2, 3: 3}),
    ]:
        for doc_id, score in bm25_rank(terms, plist, lens, k=5):
            want[(qid, doc_id)] = score
    assert set(got) == set(want)
    for key in got:
        assert abs(got[key] - want[key]) < 1e-6, key
    # no cross-language hits: the en query must not score zh docs
    assert all(d in (0, 1) for q, d in got if q == 7)
    assert all(d in (2, 3) for q, d in got if q == 8)

    # NON-VACUOUS: unscoped ("mix") stats give a different score for the
    # same (query, doc) — global df(paris)=4 vs en df=2
    mix = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(
            queries.drop("lang"), postings.drop("lang"), docs.drop("lang"), k=5
        ).collect()
    }
    assert abs(mix[(7, 0)] - got[(7, 0)]) > 1e-9


def test_bm25_title_boost_uses_per_field_doccount(spark):
    """ES/Lucene per-field statistics: docs with a null/empty title are
    excluded from the title idf's N, avg title length, and title df."""
    from kgner.bm25 import bm25_rank
    from kgner.operators.retrieval import bm25_topk

    _, postings, docs = _mk_retrieval_tables(spark)
    queries = spark.createDataFrame(
        [(7, ["paris", "city"])], "query_id long, tokens array<string>"
    )
    boost = spark.createDataFrame([(7, "paris")], "query_id long, entity string")
    got = {
        r.doc_id: r.score
        for r in bm25_topk(
            queries.select("query_id", "tokens"),
            postings.drop("lang"),
            docs.drop("lang"),
            k=10,
            boost_entities=boost,
        ).collect()
    }
    # oracle: untitled docs (1: empty, 3: null) map to [] — bm25_rank
    # excludes them from the field stats (n_tdocs=2, not 4)
    all_postings = {
        "paris": {0: 1, 1: 1, 2: 1, 3: 1}, "is": {0: 1}, "a": {0: 1},
        "city": {0: 1}, "guide": {1: 1, 3: 1}, "chengshi": {2: 1, 3: 1},
    }
    want = dict(
        bm25_rank(
            ["paris", "city"],
            all_postings,
            {0: 4, 1: 2, 2: 2, 3: 3},
            k=10,
            title_tokens={0: ["paris", "city"], 1: [],
                          2: ["paris", "guide"], 3: []},
            boost_terms=["paris"],
        )
    )
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-6, d
    # non-vacuous: with the WRONG (corpus-wide) N the boosted docs score
    # differently — idf(ln(1+(2-2+.5)/2.5)) vs idf(ln(1+(4-2+.5)/2.5))
    from kgner.bm25 import term_score

    wrong_idf_delta = abs(
        term_score(1, 2, 2.0, 2, 2) - term_score(1, 2, 2.0, 2, 4)
    )
    assert wrong_idf_delta > 1e-3


def test_bm25_topk_lang_scoped_boost_stays_in_language(spark):
    """boost_entities + lang_col: the title clause queries the same
    per-language index — title stats per lang, no cross-language boosts."""
    from kgner.bm25 import bm25_rank
    from kgner.operators.retrieval import bm25_topk

    queries, postings, docs = _mk_retrieval_tables(spark)
    boost = spark.createDataFrame(
        [(7, "paris"), (8, "paris")], "query_id long, entity string"
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(
            queries, postings, docs, k=10, boost_entities=boost, lang_col="lang"
        ).collect()
    }
    en_postings = {"paris": {0: 1, 1: 1}, "is": {0: 1}, "a": {0: 1},
                   "city": {0: 1}, "guide": {1: 1}}
    zh_postings = {"paris": {2: 1, 3: 1}, "chengshi": {2: 1, 3: 1},
                   "guide": {3: 1}}
    want = {}
    for qid, terms, plist, lens, titles in [
        (7, ["paris", "city"], en_postings, {0: 4, 1: 2},
         {0: ["paris", "city"], 1: []}),
        (8, ["paris", "chengshi"], zh_postings, {2: 2, 3: 3},
         {2: ["paris", "guide"], 3: []}),
    ]:
        for doc_id, score in bm25_rank(
            terms, plist, lens, k=10, title_tokens=titles, boost_terms=["paris"]
        ):
            want[(qid, doc_id)] = score
    assert set(got) == set(want)
    for key in got:
        assert abs(got[key] - want[key]) < 1e-6, key


def test_remove_x_tokens_empty_gold_explicit(spark):
    from kgner.operators.ensemble import remove_x_tokens

    df = spark.createDataFrame(
        [
            (["a", "b"], ["S-X", "S-PER"], ["t1", "t2"]),
            ([], [], []),
        ],
        "tokens array<string>, gold_tags array<string>, tags array<string>",
    )
    rows = {
        tuple(r.gold_tags): r
        for r in remove_x_tokens(df, gold_col="gold_tags", cols=("tokens", "tags"))
        .collect()
    }
    assert rows[("S-PER",)].tokens == ["b"]
    assert rows[()].tokens == [] and rows[()].tags == []


def test_max_df_ratio_drop_set_is_broadcast(spark):
    """The stopword cutoff must anti-join against a BROADCAST drop set —
    never shuffle the query terms against the vocabulary."""
    from kgner.operators.retrieval import bm25_topk

    queries, postings, docs = _mk_retrieval_tables(spark)
    for lang_col in (None, "lang"):
        q = queries if lang_col else queries.drop("lang")
        p = postings if lang_col else postings.drop("lang")
        d = docs if lang_col else docs.drop("lang")
        df = bm25_topk(q, p, d, k=5, max_df_ratio=0.6, lang_col=lang_col)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the anti join (term drop) must ride on a broadcast exchange; the
        # OTHER joins' strategies on these stats-free in-memory fixtures are
        # not the subject (test_plans.py guards them on parquet input)
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti and all("BroadcastHashJoin" in ln for ln in anti), plan
        # and the cutoff actually drops the over-frequent term: df(paris)
        # > 0.6*n_docs in every scope, so no score can include it
        rows = df.collect()
        assert len(rows) > 0


def test_pipeline_retrieval_knobs(spark, tmp_path):
    """retrieval_lang_scoped + max_df_ratio plumb through both retrieval
    stages; the all-en KB means en sentences still retrieve contexts."""
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.pipeline import Pipeline, PipelineConfig

    fx = build_fixtures(n_entities=10, n_pages=12, giant_pages=0)
    t = to_spark(spark, fx)
    cfg = PipelineConfig(
        workdir=str(tmp_path / "wd"),
        stages=[
            "extracted", "sentences", "kb_sentences", "canonical",
            "mentions", "retrievals", "triples",
        ],
        retrieval_lang_scoped=True,
        max_df_ratio=0.95,
        per_lang_analyzer=True,
    )
    pipe = Pipeline(spark, cfg, t["pages"], t["kb_pages"], t["redirects"])
    pipe.run()
    aug = spark.read.parquet(str(tmp_path / "wd" / "retrievals"))
    rows = aug.collect()
    assert len(rows) > 0
    # the KB is all-en (fixtures.py:142): under per-language routing only
    # en queries can have contexts; sentences of other langs exist in the
    # fixture pages, so scoping must leave SOME queries context-free while
    # en ones still retrieve
    assert any(len(r["contexts"]) > 0 for r in rows)


def test_kb_index_per_lang_analyzer(spark):
    """per_lang_analyzer=True tokenizes zh docs with the CJK analyzer (han
    chars char-level, the spliteKeyWord / ik stand-in) and leaves en docs
    whitespace-tokenized; the JVM token stream matches
    kgner.textops.split_keyword_cjk exactly."""
    from kgner.operators.kbbuild import kb_index
    from kgner.textops import split_keyword_cjk

    kb_sents = spark.createDataFrame(
        [
            ("P1", 0, 0, "巴黎是城市 Paris", "p", "u1", "zh"),
            ("P2", 0, 0, "paris is a city", "p", "u2", "en"),
        ],
        "title string, p_id int, s_id int, sentence string, "
        "paragraph string, url string, lang string",
    )
    postings, docs = kb_index(kb_sents, per_lang_analyzer=True)
    rows = postings.collect()
    zh_terms = {r.term for r in rows if r.lang == "zh"}
    en_terms = {r.term for r in rows if r.lang == "en"}
    assert zh_terms == set(
        t.lower() for t in split_keyword_cjk("巴黎是城市 Paris")
    )  # {巴, 黎, 是, 城, 市, paris}
    assert "巴黎是城市" not in zh_terms  # char-level, not run-level
    assert en_terms == {"paris", "is", "a", "city"}
    lens = {r.lang: r.len for r in docs.collect()}
    assert lens["zh"] == 6 and lens["en"] == 4
    # default analyzer unchanged: whitespace runs stay whole
    p2, _ = kb_index(kb_sents)
    zh_default = {r.term for r in p2.collect() if r.lang == "zh"}
    assert "巴黎是城市" in zh_default


def test_cjk_analyzer_unicode_whitespace_parity(spark):
    """Java \\s is ASCII-only by default; the (?U) flag makes the JVM
    analyzer agree with Python's split_keyword_cjk on U+3000 ideographic
    space (ubiquitous in real CJK text) and NBSP."""
    from kgner.functions.text import tokens_col_cjk
    from kgner.textops import split_keyword_cjk

    texts = ["河流　story　館", "a b 界", "寺庙 x　y"]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {r.s: list(r.toks) for r in df.select(
        "s", tokens_col_cjk(F.col("s")).alias("toks")).collect()}
    for t in texts:
        assert got[t] == split_keyword_cjk(t), t


def test_kb_index_null_lang_routes_to_und(spark):
    """NULL lang would silently vanish from every lang-keyed equi-join —
    kb_index routes it to the 'und' sentinel index instead."""
    from kgner.operators.kbbuild import kb_index

    kb_sents = spark.createDataFrame(
        [("P1", 0, 0, "some text here", "p", "u1", None)],
        "title string, p_id int, s_id int, sentence string, "
        "paragraph string, url string, lang string",
    )
    postings, docs = kb_index(kb_sents)
    assert all(r.lang == "und" for r in docs.collect())
    assert all(r.lang == "und" for r in postings.collect())


def test_pipeline_null_lang_retrieves_via_und(spark, tmp_path):
    """BOTH halves of the NULL-lang sentinel: a corpus whose pages AND KB
    all carry NULL lang still retrieves contexts under scoped retrieval —
    the query-side coalesce meets the kb_index-side coalesce in the same
    'und' index. A regression in either half returns zero contexts."""
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.pipeline import Pipeline, PipelineConfig

    fx = build_fixtures(n_entities=10, n_pages=10, giant_pages=0)
    t = to_spark(spark, fx)
    null_lang = F.lit(None).cast("string")
    pages = t["pages"].withColumn("lang", null_lang)
    kb_pages = t["kb_pages"].withColumn("lang", null_lang)
    cfg = PipelineConfig(
        workdir=str(tmp_path / "wd"),
        stages=["extracted", "sentences", "kb_sentences", "canonical",
                "mentions", "retrievals", "triples"],
        retrieval_lang_scoped=True,
    )
    pipe = Pipeline(spark, cfg, pages, kb_pages, t["redirects"])
    pipe.run()
    rows = spark.read.parquet(str(tmp_path / "wd" / "retrievals")).collect()
    assert len(rows) > 0
    assert any(len(r["contexts"]) > 0 for r in rows)


def test_ngram_jaccard_prefix_filter_matches_bruteforce(spark):
    """Prefix filtering (SSJoin/AllPairs candidate generation) is EXACT:
    pairs and scores equal the all-pairs brute force at high and low
    thresholds, including the planted near-dups."""
    import itertools
    import random

    from kgner.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(20)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(60)
    ]
    docs += [(1000, docs[0][1]), (1001, docs[1][1] + " extra")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shingles(t, n=3):
        toks = t.strip().lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {d: shingles(t) for d, t in docs}
    for thresh in (0.999, 0.5):
        got = {
            (r.doc_a, r.doc_b, round(r.jaccard, 6))
            for r in ngram_jaccard_pairs(df, n=3, threshold=thresh).collect()
        }
        want = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter / uni >= thresh:
                want.add((a, b, round(inter / uni, 6)))
        assert got == want, thresh
