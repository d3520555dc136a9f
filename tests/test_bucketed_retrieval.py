"""Bucketed-postings retrieval: results identical to the plain path and the
physical plan shows no Exchange on the postings side of the term join."""

from pyspark.sql import functions as F

from kgner.operators.kbbuild import kb_index, kb_sentences, write_postings_bucketed
from kgner.operators.retrieval import bm25_topk


def test_bucketed_postings_join_is_shuffle_free_on_kb_side(spark, tables, fx):
    kbs = kb_sentences(tables["kb_pages"])
    postings, docs = kb_index(kbs)
    write_postings_bucketed(postings, "t_postings_b", n_buckets=8)
    bucketed = spark.table("t_postings_b")

    from kgner.textops import split_sentences, tokenize

    qrows = []
    for i, page in enumerate(fx.pages[:6]):
        sents = split_sentences(page["text"], page["lang"])
        if sents:
            qrows.append((i, [t.lower() for t in tokenize(sents[0])]))
    queries = spark.createDataFrame(qrows, "query_id int, tokens array<string>")

    plain = bm25_topk(queries, postings, docs, k=5)
    buck = bm25_topk(queries, bucketed, docs, k=5)

    a = {(r["query_id"], r["rank"], r["doc_id"]) for r in plain.collect()}
    b = {(r["query_id"], r["rank"], r["doc_id"]) for r in buck.collect()}
    assert a == b and len(a) > 0

    # the qterms ⋈ postings join: bucketed side must not re-exchange.
    # Identify the join subplan: scan of the bucketed table should appear
    # WITHOUT a hashpartitioning Exchange between it and its SortMergeJoin/
    # ShuffledHashJoin parent. Heuristic: plan contains the bucketed scan and
    # the number of Exchanges is strictly lower than the plain plan's.
    plan_b = buck._jdf.queryExecution().executedPlan().toString()
    plan_p = plain._jdf.queryExecution().executedPlan().toString()
    assert "t_postings_b" in plan_b
    assert plan_b.count("Exchange") < plan_p.count("Exchange")
