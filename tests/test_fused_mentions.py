"""Fused pages->mentions path must equal the staged path exactly."""


def test_fused_equals_staged(spark, tables):
    from kgner.functions.text import with_sentences
    from kgner.operators.canonicalize import canonical_map
    from kgner.operators.kbbuild import alias_edges
    from kgner.operators.mentions import detect_mentions, detect_mentions_from_pages

    canon = canonical_map(
        alias_edges(tables["kb_pages"], tables["redirects"]),
        tables["kb_pages"].select("title"),
    ).cache()
    staged = {
        tuple(r)
        for r in detect_mentions(
            spark, with_sentences(tables["pages"]), canon
        ).collect()
    }
    fused = {
        tuple(r)
        for r in detect_mentions_from_pages(
            spark, tables["pages"], canon
        ).collect()
    }
    assert len(staged) > 0
    assert fused == staged
