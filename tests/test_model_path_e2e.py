"""Model-path e2e (SURVEY §3.1 mirror): sentences -> emission+Viterbi tagging
(mapInPandas) -> span decode -> multi-model majority vote -> entity link ->
gold comparison. The embedding is the deterministic stub; emissions are
engineered from the gazetteer so the CRF plumbing provably decodes what the
emissions say — the torch model swap is a one-function change (embed_fn)."""

import numpy as np
from pyspark.sql import functions as F

from kgner.functions.text import with_sentences
from kgner.operators.canonicalize import canonical_map
from kgner.operators.ensemble import decode_spans_udf, ensemble_votes, span_f1
from kgner.operators.inference import tag_with_crf
from kgner.operators.kbbuild import alias_edges


def test_model_path_matches_gold(spark, tables, fx):
    sents = with_sentences(tables["pages"]).filter(F.col("n_tokens") > 0)
    canon = canonical_map(
        alias_edges(tables["kb_pages"], tables["redirects"]),
        tables["kb_pages"].select("title"),
    )
    alias_tokens: dict[str, str] = {}
    for r in canon.collect():
        for i, tok in enumerate(r["alias_norm"].split(" ")):
            alias_tokens[tok] = "B" if i == 0 else "I"

    tagset = ["O", "B-ENT", "I-ENT"]
    dim = 4

    def embed(tokens):
        out = np.zeros((len(tokens), dim))
        for i, t in enumerate(tokens):
            kind = alias_tokens.get(t.lower().rstrip(".。"), "O")
            out[i, {"O": 0, "B": 1, "I": 2}[kind]] = 5.0
        return out

    w = np.zeros((dim, 3))
    w[0, 0] = w[1, 1] = w[2, 2] = 1.0
    transitions = np.zeros((5, 5))
    transitions[0, 2] = -10.0  # O -> I-ENT forbidden
    transitions[3, 2] = -10.0  # START -> I-ENT forbidden

    # three "models": all share the tagger here; vote threshold 0.5*3 -> 2
    preds = []
    for model_id in range(3):
        p = tag_with_crf(sents, w, transitions, tagset, embed_fn=embed).withColumn(
            "model_id", F.lit(model_id)
        )
        preds.append(p)
    allp = preds[0].unionByName(preds[1]).unionByName(preds[2])
    ens = ensemble_votes(allp)

    gold = tables["gold_mentions"].select(
        "url", "sent_id", "start", "end", F.lit("ENT").alias("label")
    )
    m = span_f1(gold, ens).agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    ).collect()[0]
    recall = m["tp"] / max(m["tp"] + m["fn"], 1)
    # The tagger tags ALL alias-token runs; gold only covers planted mentions
    # that survived the fixture's greedy scan — so recall is the gate here.
    assert recall >= 0.95, (m["tp"], m["fn"], m["fp"])

    # link the ensembled spans back to entities via the sentence tokens
    sent_toks = sents.select("url", "sent_id", "tokens")
    linked = (
        ens.join(sent_toks, ["url", "sent_id"])
        .withColumn(
            "surface",
            F.lower(
                F.concat_ws(
                    " ", F.slice("tokens", F.col("start") + 1, F.col("end") - F.col("start"))
                )
            ),
        )
        .join(
            F.broadcast(canon),
            F.col("surface") == F.col("alias_norm"),
            "inner",
        )
    )
    gold_pairs = {
        (r["url"], r["sent_id"], r["entity_id"])
        for r in tables["gold_mentions"].collect()
    }
    got_pairs = {
        (r["url"], r["sent_id"], r["canonical_id"]) for r in linked.collect()
    }
    inter = len(gold_pairs & got_pairs)
    assert inter / max(len(gold_pairs), 1) >= 0.95
