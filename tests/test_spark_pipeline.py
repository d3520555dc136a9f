"""End-to-end Spark DAG vs single-node oracle (the BASELINE.md quality gate)."""

from pyspark.sql import functions as F

from kgner.functions.text import extract_text_udf, with_sentences
from kgner.operators.canonicalize import canonical_map
from kgner.operators.ensemble import ensemble_votes, span_f1
from kgner.operators.kbbuild import alias_edges, kb_index, kb_sentences
from kgner.operators.mentions import detect_mentions
from kgner.operators.retrieval import bm25_topk
from kgner.operators.triples import all_triples
from kgner.oracle.pipeline import oracle_triples


def test_extraction_byte_identical(spark, tables, fx):
    """North-rule invariant: extract_text(html) == text for every url —
    including the dedicated zh / ja / mixed-script pages (≥3 scripts:
    han, hiragana/katakana, latin)."""
    import unicodedata

    pages = tables["pages"]
    bad = pages.filter(
        extract_text_udf(F.col("html")) != F.col("text")
    ).count()
    assert bad == 0
    # the fixture set really covers the scripts (guards against the
    # coverage silently shrinking to latin-only)
    scripts = set()
    for pg in fx.pages:
        for ch in pg["text"]:
            if ch.isalpha():
                name = unicodedata.name(ch, "")
                if name.startswith("CJK UNIFIED"):
                    scripts.add("han")
                elif "HIRAGANA" in name or "KATAKANA" in name:
                    scripts.add("kana")
                elif "LATIN" in name:
                    scripts.add("latin")
    assert {"han", "kana", "latin"} <= scripts


def test_cjk_sentence_split_dispatch_parity(spark, tables, fx):
    """Lang-aware split dispatch (kb/parse_text.py:17-32) on the REAL CJK
    fixture pages: Spark's with_sentences must reproduce the single-node
    split for the zh, ja, and mixed-script pages, fullwidth terminators
    and all."""
    from kgner.textops import split_sentences

    sents = with_sentences(tables["pages"])
    cjk = [p for p in fx.pages if p["url"].startswith("https://cjk.example.org/")]
    assert len(cjk) == 3
    for page in cjk:
        want = [
            s
            for para in page["text"].split("\n")
            for s in split_sentences(para, page["lang"])
        ]
        got = [
            r["sentence"]
            for r in sents.filter(F.col("url") == page["url"])
            .orderBy("sent_id")
            .select("sentence")
            .collect()
        ]
        assert got == want, page["url"]
        assert len(got) >= 3, page["url"]  # the terminators actually split


def test_sentences_deterministic_ids(spark, tables, fx):
    sents = with_sentences(tables["pages"])
    # page 0 of the fixture: sentence count and ordering match the oracle split
    from kgner.textops import split_sentences

    page = fx.pages[0]
    want = [
        s for para in page["text"].split("\n") for s in split_sentences(para, page["lang"])
    ]
    got = (
        sents.filter(F.col("url") == page["url"])
        .orderBy("sent_id")
        .select("sentence")
        .rdd.map(lambda r: r[0])
        .collect()
    )
    assert got == want


def test_e2e_triples_match_oracle(spark, tables, fx):
    """pages+kb -> triples; P/R vs oracle must be >= 0.95 (expected: 1.0)."""
    kb_sents = kb_sentences(tables["kb_pages"])
    edges = alias_edges(tables["kb_pages"], tables["redirects"])
    canon = canonical_map(edges, tables["kb_pages"].select("title"))
    sents = with_sentences(tables["pages"])
    mentions = detect_mentions(spark, sents, canon)
    triples = all_triples(mentions, kb_sents, canon)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in triples.select("subj", "pred", "obj").collect()
    }
    want = oracle_triples(fx)
    tp = len(got & want)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(want), 1)
    assert precision >= 0.95 and recall >= 0.95, (
        precision,
        recall,
        list(got - want)[:5],
        list(want - got)[:5],
    )


def test_ensemble_recovers_gold_spans(spark, tables):
    """MultiCoNER-F1 parity proxy (BASELINE.md): per-label AND micro span-F1
    of the 5-model majority-vote ensemble vs gold across the 6 MultiCoNER
    label classes (PER/LOC/GRP/CORP/PROD/CW)."""
    ens = ensemble_votes(tables["model_predictions"])
    gold = tables["gold_mentions"].select("url", "sent_id", "start", "end", "label")
    metrics = span_f1(gold, ens)
    rows = metrics.collect()
    assert len(rows) == 6, [r["label"] for r in rows]  # all 6 label classes
    for r in rows:
        assert r["f1"] >= 0.95, (r["label"], r["f1"])
    micro = metrics.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    ).collect()[0]
    p = micro["tp"] / max(micro["tp"] + micro["fp"], 1)
    r = micro["tp"] / max(micro["tp"] + micro["fn"], 1)
    assert p >= 0.99 and r >= 0.99, (p, r)


def test_bm25_topk_matches_oracle(spark, tables, fx):
    """Spark BM25 join vs pure-python BM25 on the same KB — same top-k sets."""
    from kgner.bm25 import bm25_rank
    from kgner.textops import tokenize

    kb_sents = kb_sentences(tables["kb_pages"]).cache()
    postings, docs = kb_index(kb_sents)

    # queries: first sentence of 12 fixture pages
    from kgner.textops import split_sentences

    qrows = []
    for i, page in enumerate(fx.pages[:12]):
        sents = split_sentences(page["text"], page["lang"])
        if sents:
            qrows.append((i, [t.lower() for t in tokenize(sents[0])]))
    queries = spark.createDataFrame(qrows, "query_id int, tokens array<string>")

    got = bm25_topk(queries, postings, docs, k=5)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))

    # oracle postings from the same kb_sents rows
    rows = kb_sents.select("title", "p_id", "s_id", "sentence").collect()
    post: dict[str, dict[int, int]] = {}
    doc_lens: dict[int, int] = {}
    iddf = docs.select("doc_id", "title", "sentence").collect()
    key2id = {(r["title"], r["sentence"]): r["doc_id"] for r in iddf}
    for r in rows:
        did = key2id[(r["title"], r["sentence"])]
        toks = [t.lower() for t in tokenize(r["sentence"])]
        doc_lens[did] = len(toks)
        for t in toks:
            post.setdefault(t, {})
            post[t][did] = post[t].get(did, 0) + 1

    for qid, qtoks in qrows:
        want = bm25_rank(list(dict.fromkeys(qtoks)), post, doc_lens, k=5)
        got_ids = [d for _, d, _ in sorted(got_map.get(qid, []))]
        want_ids = [d for d, _ in want]
        assert got_ids == want_ids, (qid, got_ids, want_ids)


def test_cc_distributed_matches_local(spark, tables):
    """The distributed min-label-propagation CC must equal driver union-find."""
    from kgner.linkops import connected_components as uf
    from kgner.operators.canonicalize import _cc_distributed

    edges = alias_edges(tables["kb_pages"], tables["redirects"])
    dist = {
        r["node"]: r["component"] for r in _cc_distributed(edges).collect()
    }
    local = uf([(r["src"], r["dst"]) for r in edges.collect()])
    assert dist == local


def test_canonicalize_handles_chain_and_cycle(spark, tables, fx):
    edges = alias_edges(tables["kb_pages"], tables["redirects"])
    canon = canonical_map(edges, tables["kb_pages"].select("title"))
    cmap = {r["alias_norm"]: r["canonical_id"] for r in canon.collect()}
    canon0 = sorted(fx.entities.keys(), key=lambda c: fx.entities[c]["idx"])[0]
    assert cmap["zqcyca"] == canon0
    assert cmap["zqcycb"] == canon0
    # 2-hop chains resolve to the entity title
    for alias, want in list(fx.alias_map.items())[:50]:
        if alias in cmap:
            assert cmap[alias] == want, (alias, cmap[alias], want)
