"""Sampling operators + CJK fixture end-to-end."""

from pyspark.sql import functions as F


def test_stratified_sample_deterministic_and_proportional(spark):
    from kgner.operators.sampling import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(10000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    s1 = stratified_sample(df, {"a": 0.5, "b": 0.1}, "lang", "id")
    s2 = stratified_sample(df, {"a": 0.5, "b": 0.1}, "lang", "id")
    ids1 = sorted(r["id"] for r in s1.collect())
    ids2 = sorted(r["id"] for r in s2.collect())
    assert ids1 == ids2  # same rows every run
    # repartitioning must not change the sample (the sampleBy failure mode)
    ids3 = sorted(r["id"] for r in stratified_sample(df.repartition(17), {"a": 0.5, "b": 0.1}, "lang", "id").collect())
    assert ids3 == ids1
    by_lang = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(by_lang["a"] / 5000 - 0.5) < 0.05
    assert abs(by_lang.get("b", 0) / 5000 - 0.1) < 0.03
    # different seed -> different sample
    ids4 = sorted(r["id"] for r in stratified_sample(df, {"a": 0.5, "b": 0.1}, "lang", "id", seed=7).collect())
    assert ids4 != ids1


def test_upsample_op(spark):
    from kgner.operators.sampling import upsample

    df = spark.createDataFrame([(1,), (2,)], "id long")
    assert upsample(df, 3).count() == 6


def test_resample_weights_matches_reference_formula(spark):
    from kgner.operators.sampling import resample_weights

    df = spark.createDataFrame(
        [(i, "en" if i < 80 else "zh") for i in range(100)], "id long, lang string"
    )
    got = {r["lang"]: r["weight"] for r in resample_weights(df, "lang").collect()}
    z = 80**0.7 + 20**0.7
    assert abs(got["en"] - 80**0.7 / z) < 1e-9
    assert abs(got["zh"] - 20**0.7 / z) < 1e-9


def test_cjk_pages_end_to_end(spark):
    """zh pages now carry real CJK tokens; the full path (extract -> CJK
    sentence rule -> match -> triples) must still equal the oracle."""
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.functions.text import with_sentences
    from kgner.operators.canonicalize import canonical_map
    from kgner.operators.kbbuild import alias_edges, kb_sentences
    from kgner.operators.mentions import detect_mentions
    from kgner.operators.triples import all_triples
    from kgner.oracle.pipeline import oracle_triples

    fx = build_fixtures(n_entities=20, n_pages=60, giant_pages=0)
    zh_pages = [p for p in fx.pages if p["lang"] == "zh"]
    assert zh_pages and any("河流" in p["text"] or "石头" in p["text"] for p in zh_pages)
    t = to_spark(spark, fx)
    canon = canonical_map(
        alias_edges(t["kb_pages"], t["redirects"]), t["kb_pages"].select("title")
    )
    mentions = detect_mentions(spark, with_sentences(t["pages"]), canon)
    triples = all_triples(mentions, kb_sentences(t["kb_pages"]), canon)
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in triples.select("subj", "pred", "obj").collect()
    }
    want = oracle_triples(fx)
    tp = len(got & want)
    assert tp / max(len(got), 1) >= 0.95 and tp / max(len(want), 1) >= 0.95
