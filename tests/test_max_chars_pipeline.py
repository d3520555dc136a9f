"""The giant-page cap must be reachable from the Pipeline and stay
oracle-symmetric (byte-identity holds when both sides use the same cap)."""

from kgner.textops import extract_text


def test_pipeline_max_text_chars(spark, tmp_path):
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.pipeline import Pipeline, PipelineConfig

    fx = build_fixtures(n_entities=8, n_pages=8, giant_pages=1)
    t = to_spark(spark, fx)
    cap = 500
    cfg = PipelineConfig(workdir=str(tmp_path / "wc"), max_text_chars=cap)
    pipe = Pipeline(spark, cfg, t["pages"], t["kb_pages"], t["redirects"])
    pipe.stage_extracted()
    ext = spark.read.parquet(str(tmp_path / "wc" / "extracted"))
    rows = {r["url"]: r["text"] for r in ext.collect()}
    assert max(len(v) for v in rows.values()) <= cap
    # byte-identity vs oracle WITH the same cap
    for page in fx.pages:
        assert rows[page["url"]] == extract_text(page["html"], max_chars=cap)