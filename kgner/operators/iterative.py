"""Iterative retrieval (SURVEY §3.3): stage-1 mention output becomes the
entity-boost input for a stage-2 retrieval pass, mirroring the reference's
two-stage flow (/root/reference/README.md:83-88,276; entity-boosted query
build kb/generate_data.py:52-55; window-based entity queries
ensemble_prediction.py:215-255).

Batch-to-batch iteration = checkpointed DAG stages, not streaming (the
reference writes predictions, then re-runs retrieval); callers materialize
between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# the reference applies the inter-CJK space-removal rule (replace_zh_space,
# ensemble_prediction.py:199-213) to queries whose lang is zh or mix; this
# is the JVM mirror of kgner.textops._ZH_SPACE_RE ((?U): Java \s is ASCII
# by default, Python's is Unicode — U+3000 must behave identically).
# DELIBERATE DEVIATION: the reference regex also strips spaces adjacent to
# digits and CJK/ASCII punctuation, and its global text.replace has known
# side effects inside latin substrings; this narrower inter-CJK-only rule
# is kept intentionally (same deviation class as CJK_ANALYZER_LANGS,
# kgner/functions/text.py).
_ZH_SPACE_JVM = r"(?U)(?<=[一-鿿　-〿])\s+(?=[一-鿿　-〿])"
_ZH_SPACE_LANGS = ("zh", "mix")


def entity_window_queries(
    sents: DataFrame,
    spans: DataFrame,
    window: int = 0,
    lang_col: str | None = None,
) -> DataFrame:
    """Window-based entity query generation for stage-2 retrieval —
    gen_ner_based_query (/root/reference/ensemble_prediction.py:215-255):
    one query per stage-1 entity span, built from the tokens
    [max(0, start-window) : min(n_tokens, end+window)] around it (spans are
    [start, end) token intervals, 0-based, end exclusive — check_span's
    convention), clipped at sentence boundaries exactly as the reference
    clips. Pure array ops, map-side after the (url, sent_id) equi-join.

    sents: (url, sent_id, tokens[, lang]); spans: (url, sent_id, start,
    end, ...). -> one row per span: (url, sent_id, start, end, query_text,
    sentence_text[, lang]); query_text/sentence_text are space-joined, with
    inter-CJK spaces removed for zh/mix rows when lang_col is given
    (gen_sentence's replace_zh_space路由; the reference's mix->zh switch
    only affects routing, not this rule — both langs trigger it)."""
    keep = ["url", "sent_id", "tokens"] + ([lang_col] if lang_col else [])
    j = spans.join(sents.select(*keep), ["url", "sent_id"])
    n = F.size("tokens")
    s0 = F.greatest(F.col("start") - F.lit(window), F.lit(0))
    e0 = F.least(F.col("end") + F.lit(window), n)
    qt = F.concat_ws(" ", F.slice("tokens", s0 + 1, e0 - s0))
    st = F.concat_ws(" ", F.col("tokens"))
    if lang_col:
        is_cjk = F.col(lang_col).isin(*_ZH_SPACE_LANGS)
        qt = F.when(is_cjk, F.regexp_replace(qt, _ZH_SPACE_JVM, "")).otherwise(qt)
        st = F.when(is_cjk, F.regexp_replace(st, _ZH_SPACE_JVM, "")).otherwise(st)
    out_cols = [
        "url",
        "sent_id",
        "start",
        "end",
        qt.alias("query_text"),
        st.alias("sentence_text"),
    ]
    if lang_col:
        out_cols.append(F.col(lang_col))
    return j.select(*out_cols)


def iterative_retrieval(
    spark: SparkSession,
    queries: DataFrame,
    postings: DataFrame,
    docs: DataFrame,
    aliases: DataFrame,
    k: int = 10,
    title_boost: float = 2.0,
    lang_col: str | None = None,
    max_df_ratio: float | None = None,
    query_window: int | None = None,
    zh_lexicon=None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-round retrieval.

    queries: (query_id, tokens array<string>) — lowercased.
    lang_col / max_df_ratio pass through to both bm25_topk rounds (the
    reference routes BOTH stages to the same per-language index, and the
    stopword cutoff applies to re-retrieval exactly as to round 1).
    Returns (round1_retrievals, boost_entities, round2_retrievals):
    round 1 is plain BM25; mentions detected in the QUERY text against the
    alias table become per-query boost entities; round 2 re-retrieves with
    the title-boost clause, as the reference's `--with_entity` second stage.

    query_window (reference `window` flag, ensemble_prediction.py:215-255):
    when set, round 2 queries are the ±query_window-token WINDOWS around
    the stage-1 mentions instead of the full sentences — one re-retrieval
    per detected entity, each query re-keyed to
    xxhash64(query_id, start, end) so multiple windows of one sentence stay
    distinct rows; the entity boost applies to the window's own query_id,
    and every round-2 row carries (parent_query_id, span_start, span_end)
    so callers can attribute window hits back to the sentence and span
    without re-deriving the hash.

    zh_lexicon: when the KB index was built with kb_index(zh_lexicon=),
    pass the SAME lexicon so zh/mix window queries re-tokenize with the
    dictionary analyzer — char-level tokens cannot match multi-char
    dictionary posting terms. Requires lang_col (the dict re-tokenization
    is routed by language; without routing the lexicon would silently
    never apply — the same misconfiguration class
    PipelineConfig.__post_init__ guards against).
    """
    if zh_lexicon is not None and lang_col is None:
        raise ValueError(
            "zh_lexicon requires lang_col: dictionary re-tokenization is "
            "routed per language, so without lang routing zh window queries "
            "would keep char-level tokens that can never match the "
            "dictionary-built postings (pass lang_col, as kb_index did)"
        )
    from kgner.operators.mentions import detect_mentions
    from kgner.operators.retrieval import bm25_topk

    kw = {"lang_col": lang_col, "max_df_ratio": max_df_ratio}
    r1 = bm25_topk(queries, postings, docs, k=k, **kw)

    qsents = queries.select(
        F.col("query_id").cast("string").alias("url"),
        F.lit(0).cast("int").alias("sent_id"),
        "tokens",
        *([lang_col] if lang_col else []),
    )
    found = detect_mentions(
        spark, qsents.select("url", "sent_id", "tokens"), aliases
    )
    boost = found.select(
        F.col("url").cast("long").alias("query_id"),
        F.col("entity_id").alias("entity"),
    ).distinct()

    if query_window is None:
        r2_queries, r2_boost = queries, boost
    else:
        # window queries inherit the parent sentence's language (qsents
        # carries it through entity_window_queries untouched)
        win = entity_window_queries(
            qsents, found.select("url", "sent_id", "start", "end"),
            window=query_window, lang_col=lang_col,
        )
        wq_id = F.xxhash64(F.col("url").cast("long"), "start", "end")
        toks = F.split(F.col("query_text"), " ")
        if lang_col:
            # zh/mix window text had inter-CJK spaces removed (reference
            # emits the query STRING and lets ES re-analyze server-side);
            # here the analyzer is explicit and must mirror kb_index's
            # ROUTING exactly: the dictionary applies to zh (and mix, the
            # reference's zh-containing mode) ONLY — ja/ko stay char-level,
            # because kb_index indexed them char-level and multi-char
            # dictionary query terms would match zero of their postings.
            # NULL-mask non-dict rows into the analyzer (Arrow UDF for
            # large lexica is evaluated per-row regardless of the branch).
            from kgner.functions.text import (
                CJK_ANALYZER_LANGS,
                tokens_col_cjk,
                tokens_col_cjk_dict,
            )

            char_toks = tokens_col_cjk(F.col("query_text"))
            toks = F.when(
                F.col(lang_col).isin(*CJK_ANALYZER_LANGS, "mix"), char_toks
            ).otherwise(toks)
            if zh_lexicon:
                is_zh = F.col(lang_col).isin("zh", "mix")
                masked = F.when(is_zh, F.col("query_text"))
                toks = F.when(
                    is_zh, tokens_col_cjk_dict(masked, zh_lexicon)
                ).otherwise(toks)
        r2_queries = win.select(
            wq_id.alias("query_id"),
            toks.alias("tokens"),
            *([lang_col] if lang_col else []),
        ).distinct()
        # (window-id -> sentence/span) attribution, joined back onto r2
        win_map = win.select(
            wq_id.alias("query_id"),
            F.col("url").cast("long").alias("parent_query_id"),
            F.col("start").alias("span_start"),
            F.col("end").alias("span_end"),
        ).distinct()
        r2_boost = (
            found.select(
                wq_id.alias("query_id"), F.col("entity_id").alias("entity")
            ).distinct()
        )

    r2 = bm25_topk(
        r2_queries, postings, docs, k=k, boost_entities=r2_boost,
        title_boost=title_boost, **kw
    )
    if query_window is not None:
        # NO forced broadcast: win_map has one row per stage-1 mention,
        # which at web scale is far beyond broadcast size; both sides are
        # keyed on query_id, so this is a co-keyed join AQE can still
        # broadcast at small scale from runtime stats
        r2 = r2.join(win_map, "query_id")
    return r1, boost, r2
