"""Scale knobs: BM25 common-term pruning and giant-page text cap."""

from pyspark.sql import functions as F

from kgner.operators.kbbuild import kb_index, kb_sentences
from kgner.operators.retrieval import bm25_topk
from kgner.textops import extract_text


def test_bm25_max_df_pruning(spark, tables, fx):
    """Pruned retrieval must equal exact retrieval when queries are re-scored
    without the over-frequent terms (idf-tiny terms barely move ranks)."""
    kbs = kb_sentences(tables["kb_pages"]).cache()
    postings, docs = kb_index(kbs)

    from kgner.textops import split_sentences, tokenize

    page = next(p for p in fx.pages if split_sentences(p["text"], p["lang"]))
    qtokens = [t.lower() for t in tokenize(split_sentences(page["text"], page["lang"])[0])]
    queries = spark.createDataFrame(
        [(0, qtokens)], "query_id int, tokens array<string>"
    )

    exact = bm25_topk(queries, postings, docs, k=5).collect()
    pruned = bm25_topk(queries, postings, docs, k=5, max_df_ratio=0.3).collect()
    assert len(pruned) > 0
    # pruned scores never exceed exact (terms only removed)
    exact_scores = {r["doc_id"]: r["score"] for r in exact}
    for r in pruned:
        if r["doc_id"] in exact_scores:
            assert r["score"] <= exact_scores[r["doc_id"]] + 1e-9
    # ratio=1.0 drops nothing -> identical results
    same = bm25_topk(queries, postings, docs, k=5, max_df_ratio=1.0).collect()
    assert [(r["rank"], r["doc_id"]) for r in same] == [
        (r["rank"], r["doc_id"]) for r in exact
    ]


def test_extract_text_max_chars():
    html = b"<p>" + b"word " * 1000 + b"</p>"
    full = extract_text(html)
    capped = extract_text(html, max_chars=100)
    assert len(capped) == 100
    assert full.startswith(capped)
    assert extract_text(html, max_chars=10**9) == full
