"""BM25 scoring math — pure functions shared by the Spark retrieval join and
the oracle.

The reference delegates scoring to ElasticSearch (kb/build_kb.py:17-36 index,
kb/generate_data.py:33-68 `_msearch` with `bool.should` match on text +
optional title boost x2).  We re-express the index as DATA (postings/docs
DataFrames) and the query as a similarity top-k join (SURVEY.md §2 J-1); the
per-(term,doc) contribution below is Lucene's BM25 (k1=1.2, b=0.75) so scores
are reproducible in plain SQL too.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


def idf(doc_freq: int, n_docs: int) -> float:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def term_score(tf: int, doc_len: int, avg_len: float, doc_freq: int, n_docs: int) -> float:
    """BM25 contribution of one (term, doc)."""
    denom = tf + K1 * (1.0 - B + B * doc_len / avg_len)
    return idf(doc_freq, n_docs) * tf * (K1 + 1.0) / denom


def bm25_rank(
    query_terms: list[str],
    postings: dict[str, dict[int, int]],
    doc_lens: dict[int, int],
    k: int = 10,
    title_tokens: dict[int, list[str]] | None = None,
    boost_terms: list[str] | None = None,
    title_boost: float = 2.0,
) -> list[tuple[int, float]]:
    """Oracle-side BM25 top-k: returns [(doc_id, score)] sorted by
    (score desc, doc_id asc) — the deterministic tiebreak from SURVEY §7.3.

    `boost_terms` models the reference's entity-boosted `match(title, entity,
    boost=2.0)` clause (kb/generate_data.py:52-55) with ES-exact semantics:
    bool.should SUMS clause scores and the boost MULTIPLIES the TITLE-FIELD
    BM25 score — tf counted in the title tokens, title length / avg title
    length as the field norm, df = #titles containing the term, idf's N =
    #docs with a non-empty title (ES/Lucene per-field docCount).
    `title_tokens` maps doc_id -> its title token list; docs with no title
    may be omitted or mapped to [] — both are excluded from the field
    statistics, matching the Spark side's empty-title filter.
    """
    n_docs = len(doc_lens)
    if n_docs == 0:
        return []
    avg_len = sum(doc_lens.values()) / n_docs
    scores: dict[int, float] = {}
    # each unique query term scores once (the ES match query and the Spark
    # path's array_distinct both dedupe repeated tokens)
    for term in dict.fromkeys(query_terms):
        plist = postings.get(term)
        if not plist:
            continue
        df = len(plist)
        for doc_id, tf in plist.items():
            scores[doc_id] = scores.get(doc_id, 0.0) + term_score(
                tf, doc_lens[doc_id], avg_len, df, n_docs
            )
    if boost_terms and title_tokens:
        titled = {d: t for d, t in title_tokens.items() if t}
        if titled:
            n_tdocs = len(titled)
            avg_tlen = sum(len(t) for t in titled.values()) / n_tdocs
            for term in dict.fromkeys(boost_terms):
                tdf = sum(1 for toks in titled.values() if term in toks)
                if tdf == 0:
                    continue
                for doc_id, toks in titled.items():
                    ttf = toks.count(term)
                    if ttf:
                        scores[doc_id] = scores.get(doc_id, 0.0) + title_boost * term_score(
                            ttf, len(toks), avg_tlen, tdf, n_tdocs
                        )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
