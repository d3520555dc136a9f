"""Chunking (chunk_sentence semantics), doc grouping (J-4), and the
second-round retrieval pipeline stage (§3.3)."""

from pyspark.sql import functions as F

from kgner.operators.chunking import assign_doc_ids, chunk_by_subtokens


def test_chunk_by_subtokens(spark):
    df = spark.createDataFrame(
        [("u", 0, [f"t{i}" for i in range(10)]), ("u", 1, ["a", "b"])],
        "url string, sent_id int, tokens array<string>",
    )
    got = {
        (r["sent_id"], r["chunk_id"]): list(r["chunk_tokens"])
        for r in chunk_by_subtokens(df, budget=4).collect()
    }
    assert got[(0, 0)] == ["t0", "t1", "t2", "t3"]
    assert got[(0, 1)] == ["t4", "t5", "t6", "t7"]
    assert got[(0, 2)] == ["t8", "t9"]
    assert got[(1, 0)] == ["a", "b"]
    # reassembly preserves the original sequence
    flat = sum((got[(0, i)] for i in range(3)), [])
    assert flat == [f"t{i}" for i in range(10)]


def test_assign_doc_ids(spark):
    rows = [
        ("f", 0, True),
        ("f", 1, False),
        ("f", 2, False),
        ("f", 3, True),
        ("f", 4, False),
        ("g", 0, True),
        ("g", 1, False),
    ]
    df = spark.createDataFrame(rows, "file string, sent_id int, is_docstart boolean")
    got = {
        (r["file"], r["sent_id"]): (r["doc_id"], r["doc_pos"])
        for r in assign_doc_ids(df).collect()
    }
    assert got[("f", 1)] == (1, 0)
    assert got[("f", 2)] == (1, 1)
    assert got[("f", 4)] == (2, 0)
    assert got[("g", 1)] == (1, 0)
    assert ("f", 0) not in got  # boundary rows dropped


def test_pipeline_second_round_retrieval(spark, tmp_path):
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.pipeline import Pipeline, PipelineConfig

    fx = build_fixtures(n_entities=10, n_pages=10, giant_pages=0)
    t = to_spark(spark, fx)
    cfg = PipelineConfig(
        workdir=str(tmp_path / "w2"),
        stages=[
            "extracted", "sentences", "kb_sentences", "canonical",
            "mentions", "retrievals2", "triples",
        ],
    )
    Pipeline(spark, cfg, t["pages"], t["kb_pages"], t["redirects"]).run()
    r2 = spark.read.parquet(str(tmp_path / "w2" / "retrievals2"))
    assert r2.count() > 0
    assert r2.filter(F.col("rank") == 1).count() > 0
    # every retrieved rank block is contiguous 1..k' per query
    bad = (
        r2.groupBy("query_id")
        .agg(F.max("rank").alias("mx"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("mx") != F.col("n"))
        .count()
    )
    assert bad == 0