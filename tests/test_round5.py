"""Round-5 coverage: contract consolidation fallout + giant-doc byte cap."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shingle_df_counts(spark):
    """Direct shingle_df unit check (the standalone `shingles` contract row
    was folded into the ngram_jaccard family; this keeps the per-doc
    shingle-count coverage)."""
    from kgner.operators.dedup import shingle_df

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # 2 distinct 3-grams
            (2, "a b"),              # shorter than n -> 1 whole-doc shingle
            (3, "x x x x x"),        # repeated 3-gram collapses to 1
            (4, "p q r p q r p q"),  # 6 windows, 3 distinct rotations
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in shingle_df(docs, n=3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {1: 2, 2: 1, 3: 1, 4: 3}


def test_ngram_jaccard_giant_doc_cap(spark):
    """max_doc_shingles: one pathological giant doc must not change results
    for normal docs, the giant's per-doc set must be bounded before the
    collect, and NEAR-identical giants (the feature's motivating case) must
    still pair up — bottom-k-by-hash retention keeps nearly identical
    samples on both sides, where rarest-first retention would keep each
    giant's PRIVATE shingles and miss the pair entirely."""
    from kgner.operators.dedup import ngram_jaccard_pairs

    normal = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, "one two three four five six seven eight nine"),
    ]
    words_a = [f"tok{i % 7919} w{i}" for i in range(6000)]
    # ~1% perturbation: near-dup, NOT byte-identical (true J ~= 0.96)
    words_b = [
        (w if i % 100 else f"CHANGED{i}") for i, w in enumerate(words_a)
    ]
    rows = normal + [
        (100, " ".join(words_a)),
        (101, " ".join(words_b)),
        (102, " ".join(f"other{i} z{i * 3}" for i in range(6000))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.9, max_doc_shingles=1000
        ).collect()
    }
    # identical normal docs survive; near-identical giants are FOUND with
    # high estimated jaccard even though only 1000 of ~12k shingles were
    # retained per side (bottom-k sample concentration)
    assert capped[(1, 2)] == 1.0
    assert (100, 101) in capped and capped[(100, 101)] >= 0.9
    assert (1, 3) not in capped
    # the unrelated giant pairs with nothing (hash sampling must not
    # manufacture overlap)
    assert not any(102 in k for k in capped)

    # normal-doc results are IDENTICAL to the uncapped plan
    uncapped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    assert (100, 101) in uncapped  # sanity: true near-dup pre-cap
    small = {k: v for k, v in capped.items() if k[0] < 100 and k[1] < 100}
    small_un = {k: v for k, v in uncapped.items() if k[0] < 100 and k[1] < 100}
    assert small == small_un


def test_fmm_segment_jvm_python_parity(spark):
    """fmm_segment_col (JVM aggregate fold) must equal the Python mirror on
    longest-match, FMM-greediness, mixed-script, U+3000 and empty inputs."""
    from kgner.functions.text import tokens_col_cjk_dict
    from kgner.textops import fmm_segment, split_keyword_cjk_dict

    lex = ["北京", "大学", "北京大学", "京剧"]
    cases = [
        "北京大学在北京",       # longest match: 北京大学, not 北京+大学
        "南北京剧团",           # FMM greediness: 南 北京 剧 团
        "我爱北京hello world 京剧院",
        "北京\u3000大学",       # ideographic space splits runs identically
        "京",
        "abc def",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select(
        "s", tokens_col_cjk_dict(F.col("s"), lex).alias("t")
    ).collect()
    for r in rows:
        assert list(r["t"]) == split_keyword_cjk_dict(r["s"], lex), r["s"]
    assert fmm_segment("北京大学在北京", lex) == ["北京大学", "在", "北京"]
    assert fmm_segment("南北京剧团", lex) == ["南", "北京", "剧", "团"]


def test_zh_dict_retrieval_word_level_wins(spark):
    """The ranking the char-level analyzer gets WRONG and the dictionary
    analyzer gets right (VERDICT r4 item 3): a doc stuffed with the chars
    北 and 京 (never adjacent) outscores the true 北京 doc under char-level
    BM25, while dictionary segmentation only matches the true doc."""
    from kgner.functions.text import tokens_col_cjk, tokens_col_cjk_dict
    from kgner.operators.kbbuild import kb_index
    from kgner.operators.retrieval import bm25_topk

    lex = ["北京"]
    pages = [
        ("A", 0, 0, "我爱北京天安门", "p", "u://a"),
        ("B", 0, 0, "北风京戏北风京戏北风京戏", "p", "u://b"),
        ("C", 0, 0, "今天天气很好呀", "p", "u://c"),
        ("D", 0, 0, "大家都去上学了", "p", "u://d"),
    ]
    kb_sents = spark.createDataFrame(
        [(t, p, s, sent, para, u, "zh") for t, p, s, sent, para, u in pages],
        "title string, p_id int, s_id int, sentence string, paragraph string,"
        " url string, lang string",
    )

    def top_titles(zh_lexicon):
        postings, docs = kb_index(
            kb_sents, per_lang_analyzer=True, zh_lexicon=zh_lexicon
        )
        qtok = (
            tokens_col_cjk_dict(F.lit("北京"), zh_lexicon)
            if zh_lexicon
            else tokens_col_cjk(F.lit("北京"))
        )
        queries = spark.range(1).select(
            F.lit(0).cast("long").alias("query_id"), qtok.alias("tokens")
        )
        out = bm25_topk(queries, postings, docs, k=4).orderBy("rank")
        return [r["title"] for r in out.collect()]

    char_rank = top_titles(None)
    dict_rank = top_titles(lex)
    # char-level: the char-stuffed doc B wins the ranking (tf 3 vs 1 for
    # both query chars) — the wrong answer
    assert char_rank[0] == "B", char_rank
    assert "A" in char_rank
    # dictionary: only the doc containing the WORD 北京 matches at all
    assert dict_rank == ["A"], dict_rank


def test_pipeline_zh_lexicon_plumbs_query_side(spark, tmp_path):
    """PipelineConfig.zh_lexicon reaches BOTH sides: the kb_index analyzer
    and the query re-tokenization in _retrieval_inputs — zh query token
    streams must contain the multi-char lexicon word as ONE token."""
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.pipeline import Pipeline, PipelineConfig

    lex = ["河流", "故事", "山谷", "港口", "桥梁"]
    fx = build_fixtures(n_entities=10, n_pages=12, giant_pages=0)
    t = to_spark(spark, fx)
    cfg = PipelineConfig(
        workdir=str(tmp_path / "wd"),
        stages=["extracted", "sentences", "kb_sentences", "canonical"],
        retrieval_lang_scoped=True,
        per_lang_analyzer=True,
        zh_lexicon=lex,
    )
    pipe = Pipeline(spark, cfg, t["pages"], t["kb_pages"], t["redirects"])
    pipe.run()
    queries, postings, docs = pipe._retrieval_inputs()
    toks = [
        set(r["tokens"])
        for r in queries.filter(F.col("lang") == "zh").collect()
    ]
    assert toks, "fixture must contain zh sentences"
    hit = set().union(*toks) & set(lex)
    assert hit, "zh query tokens must contain dictionary words as units"
    # and every emitted han token is either a lexicon word or one char
    for s in toks:
        for tok in s:
            if any("一" <= c <= "鿿" for c in tok):
                assert tok in lex or len(tok) == 1, tok


def test_entity_window_queries_reference_semantics(spark):
    """Window slice must mirror gen_ner_based_query exactly
    (ensemble_prediction.py:215-255): spans [start, end) 0-based, window
    extends BOTH sides, clipped at sentence boundaries; window=0 yields
    exactly the entity tokens; zh/mix rows drop inter-CJK spaces."""
    from kgner.operators.iterative import entity_window_queries

    sents = spark.createDataFrame(
        [
            ("d1", 0, ["t0", "t1", "t2", "t3", "t4"], "en"),
            ("d2", 0, ["我", "爱", "北", "京", "hello"], "zh"),
        ],
        "url string, sent_id int, tokens array<string>, lang string",
    )
    spans = spark.createDataFrame(
        [
            ("d1", 0, 1, 3),   # entity = t1 t2
            ("d1", 0, 0, 1),   # at start boundary
            ("d1", 0, 4, 5),   # at end boundary
            ("d2", 0, 2, 4),   # han entity
        ],
        "url string, sent_id int, start int, end int",
    )

    def got(window, lang_col=None):
        return {
            (r["url"], r["start"], r["end"]): r["query_text"]
            for r in entity_window_queries(
                sents, spans, window=window, lang_col=lang_col
            ).collect()
        }

    w0 = got(0)
    assert w0[("d1", 1, 3)] == "t1 t2"
    assert w0[("d1", 0, 1)] == "t0"
    assert w0[("d1", 4, 5)] == "t4"

    w2 = got(2)
    assert w2[("d1", 1, 3)] == "t0 t1 t2 t3 t4"     # clipped both sides
    assert w2[("d1", 0, 1)] == "t0 t1 t2"            # start clip: max(0, -2)
    assert w2[("d1", 4, 5)] == "t2 t3 t4"            # end clip: min(n, 7)

    wz = got(0, lang_col="lang")
    assert wz[("d2", 2, 4)] == "北京"                # inter-CJK space gone
    # window past the han run keeps the latin-boundary space
    wz2 = got(2, lang_col="lang")
    assert wz2[("d2", 2, 4)] == "我爱北京 hello"
    # sentence_text carries the zh rule too
    row = (
        entity_window_queries(sents, spans, window=0, lang_col="lang")
        .filter((F.col("url") == "d2"))
        .collect()[0]
    )
    assert row["sentence_text"] == "我爱北京 hello"


def test_iterative_retrieval_query_window(spark, tmp_path):
    """query_window: round 2 runs one window query per stage-1 mention,
    re-keyed per window, with the entity boost attached to the window's own
    query_id."""
    from kgner.operators.iterative import iterative_retrieval
    from kgner.operators.kbbuild import kb_index

    kb_sents = spark.createDataFrame(
        [
            ("River", 0, 0, "the river flows past the stone bridge", "p", "u1", "en"),
            ("Stone", 0, 0, "a stone wall stands near the river", "p", "u2", "en"),
            ("Sky", 0, 0, "clouds drift in the blue sky today", "p", "u3", "en"),
        ],
        "title string, p_id int, s_id int, sentence string, paragraph string,"
        " url string, lang string",
    )
    postings, docs = kb_index(kb_sents)
    aliases = spark.createDataFrame(
        [("river", "River"), ("stone bridge", "Stone")],
        "alias_norm string, canonical_id string",
    )
    queries = spark.createDataFrame(
        [(7, ["the", "river", "by", "the", "stone", "bridge", "today"])],
        "query_id long, tokens array<string>",
    )
    r1, boost, r2 = iterative_retrieval(
        spark, queries, postings, docs, aliases, k=3, query_window=1
    )
    # stage 1 found two mentions -> two distinct window query ids in round 2
    assert boost.count() == 2
    r2_ids = {r["query_id"] for r in r2.select("query_id").distinct().collect()}
    assert len(r2_ids) == 2
    assert 7 not in r2_ids  # windows are re-keyed, not the sentence id
    # every window query retrieved something from the 3-doc kb
    assert r2.filter(F.col("rank") == 1).count() == 2
    # round-2 rows carry sentence/span attribution back to the parent query
    att = {(r["parent_query_id"], r["span_start"], r["span_end"])
           for r in r2.select("parent_query_id", "span_start", "span_end").collect()}
    assert all(p == 7 for p, _, _ in att) and len(att) == 2


def test_zh_dict_segment_plan_is_jvm_only(spark):
    """The FMM fold must stay inside whole-stage codegen: no Python eval
    nodes anywhere in the zh_dict_segment plan (the analyzer would be a
    scale bottleneck as a UDF)."""
    from kgner.queries import QUERIES

    df = QUERIES["zh_dict_segment"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_cjk_dict_udf_parity_with_jvm_path(spark):
    """The large-lexicon Arrow UDF path must produce the SAME token stream
    as the JVM fold (tokens_col_cjk_dict switches between them on lexicon
    size — semantics may not drift across that boundary)."""
    from kgner.functions.text import (
        make_cjk_dict_tokens_udf,
        tokens_col_cjk_dict,
    )

    lex = ["北京", "大学", "北京大学", "京剧"]
    cases = [
        "北京大学在北京",
        "南北京剧团",
        "我爱北京hello world 京剧院",
        "北京　大学",
        "abc def",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select(
        "s",
        tokens_col_cjk_dict(F.col("s"), lex).alias("jvm"),
        make_cjk_dict_tokens_udf(lex)(F.col("s")).alias("udf"),
    ).collect()
    for r in rows:
        assert list(r["jvm"]) == list(r["udf"]), r["s"]


def test_cjk_dict_max_word_mode(spark):
    """ik_max_word semantics: every char + every lexicon word occurrence
    (overlapping words both emitted), JVM column == Python mirror; and
    kb_index(zh_dict_mode='max_word') postings carry BOTH overlapping words
    while smart mode carries only the FMM winner."""
    from kgner.functions.text import tokens_col_cjk_dict_max
    from kgner.operators.kbbuild import kb_index
    from kgner.textops import split_keyword_cjk_dict_max

    lex = ["北京", "京剧", "大学"]
    cases = ["南北京剧团", "北京大学 hello 北京", ""]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select(
        "s", tokens_col_cjk_dict_max(F.col("s"), lex).alias("t")
    ).collect()
    for r in rows:
        assert sorted(r["t"]) == sorted(split_keyword_cjk_dict_max(r["s"], lex)), r["s"]
    # overlapping 北京 and 京剧 BOTH emitted (FMM would pick only 北京)
    got = sorted(rows[0]["t"])
    assert got.count("北京") == 1 and got.count("京剧") == 1

    kb_sents = spark.createDataFrame(
        [("T", 0, 0, "南北京剧团", "p", "u", "zh")],
        "title string, p_id int, s_id int, sentence string, paragraph string,"
        " url string, lang string",
    )
    def terms(mode):
        postings, _ = kb_index(
            kb_sents, per_lang_analyzer=True, zh_lexicon=lex, zh_dict_mode=mode
        )
        return {r["term"] for r in postings.collect()}

    mx, sm = terms("max_word"), terms("smart")
    assert {"北京", "京剧"} <= mx          # both granularities indexed
    assert "京剧" not in sm and "北京" in sm  # FMM picked one segmentation
    assert {"南", "剧", "团"} <= mx          # chars always present in max mode


def test_cjk_dict_max_udf_parity(spark):
    """Scan-UDF max_word path must produce the same token MULTISET as the
    JVM length-arithmetic path for non-self-periodic words (real zh)."""
    from kgner.functions.text import (
        make_cjk_dict_max_tokens_udf,
        tokens_col_cjk_dict_max,
    )

    lex = ["北京", "京剧", "大学"]
    cases = ["南北京剧团", "北京大学 hello 北京大学", ""]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select(
        "s",
        tokens_col_cjk_dict_max(F.col("s"), lex).alias("jvm"),
        make_cjk_dict_max_tokens_udf(lex)(F.col("s")).alias("udf"),
    ).collect()
    for r in rows:
        assert sorted(r["jvm"]) == sorted(r["udf"]), r["s"]


def test_cjk_dict_max_self_periodic_and_generators(spark):
    """Review regressions: (a) self-periodic lexicon words (哈哈 in 哈哈哈)
    must count NON-overlapping on BOTH max_word paths (JVM replace
    arithmetic == scan UDF with per-word cursor); (b) one-shot iterable
    lexica must not be silently half-consumed into char-level output."""
    from kgner.functions.text import (
        make_cjk_dict_max_tokens_udf,
        tokens_col_cjk_dict,
        tokens_col_cjk_dict_max,
    )

    lex = ["哈哈", "天天"]
    df = spark.createDataFrame([("哈哈哈",), ("天天天天",)], "s string")
    rows = df.select(
        "s",
        tokens_col_cjk_dict_max(F.col("s"), lex).alias("jvm"),
        make_cjk_dict_max_tokens_udf(lex)(F.col("s")).alias("udf"),
    ).collect()
    for r in rows:
        assert sorted(r["jvm"]) == sorted(r["udf"]), (r["s"], r["jvm"], r["udf"])
    by_s = {r["s"]: sorted(r["jvm"]) for r in rows}
    assert by_s["哈哈哈"].count("哈哈") == 1      # non-overlapping
    assert by_s["天天天天"].count("天天") == 2

    # generator lexicon: both entry points must see the full lexicon
    out = df.select(
        tokens_col_cjk_dict(F.col("s"), (w for w in ["哈哈"])).alias("t")
    ).collect()
    assert ["哈哈", "哈"] == list(out[0]["t"])
