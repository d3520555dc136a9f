"""The explode+equi-join mention matcher (used when the alias table can't
broadcast) must agree with the broadcast-scan matcher."""


def test_mentions_by_join_matches_broadcast_scan(spark, tables):
    from kgner.functions.text import with_sentences
    from kgner.operators.canonicalize import canonical_map
    from kgner.operators.kbbuild import alias_edges
    from kgner.operators.mentions import detect_mentions, mentions_by_join

    sents = with_sentences(tables["pages"]).limit(400).cache()
    canon = canonical_map(
        alias_edges(tables["kb_pages"], tables["redirects"]),
        tables["kb_pages"].select("title"),
    ).cache()
    scan = {
        (r["url"], r["sent_id"], r["start"], r["end"], r["entity_id"])
        for r in detect_mentions(spark, sents, canon).collect()
    }
    join = {
        (r["url"], r["sent_id"], r["start"], r["end"], r["entity_id"])
        for r in mentions_by_join(sents, canon, max_ngram=2).collect()
    }
    assert len(scan) > 0
    assert join == scan
