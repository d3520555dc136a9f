"""Round-6 optimization guards: restructured operators must produce the
exact rows the pre-optimization shapes produced."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_entity_spans_jvm_decode_matches_udf(spark):
    """q_entity_spans' JVM run-decode == decode_spans_udf over gaz BIO tags
    (the pre-r6 implementation), including multi-token runs and docs with
    no entities."""
    from kgner.operators.ensemble import decode_spans_udf
    from kgner.queries import GAZ, _gaz_bio_tags, _toks, q_entity_spans

    d = spark.read.parquet(f"{SF}/documents.parquet")
    toks = _toks(F.col("text"))
    tags = _gaz_bio_tags(toks)
    spans = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        toks.alias("toks"),
        F.explode(decode_spans_udf(tags)).alias("span"),
    )
    ref = spans.select(
        "doc_id",
        (F.col("span.start") + 1).cast("long").alias("start_pos"),
        (F.col("span.end") - F.col("span.start")).cast("long").alias("span_len"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("toks"),
                F.col("span.start") + 1,
                F.col("span.end") - F.col("span.start"),
            ),
        ).alias("span_text"),
    )
    got = q_entity_spans(spark, SF)
    assert _rows(got) == _rows(ref)
    # sanity: the fixture corpus actually exercises runs (multi-token spans)
    assert got.filter(F.col("span_len") > 1).count() > 0
    assert any(g in r[3] for r in _rows(got)[:50] for g in GAZ)


def test_minhash_signatures_arrayfold_matches_groupby(spark):
    """Map-only aggregate() minhash signatures == the explode+groupBy(min)
    shape, for both the xxhash64 and the (base, perm) affine hash modes."""
    from kgner.functions.hashing import affine_perm, stable_base_p61
    from kgner.operators.dedup import minhash_signatures, shingle_df

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    def reference(hash_fn=None, base_fn=None, perm_fn=None, num_hashes=8):
        sh = shingle_df(docs, 3)
        if base_fn is not None:
            sh = sh.withColumn("__h", base_fn(F.col("shingle")))
            mins = [
                F.min(perm_fn(F.col("__h"), i)).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        else:
            hf = hash_fn or (lambda c, seed: F.xxhash64(c, F.lit(seed)))
            mins = [
                F.min(hf(F.col("shingle"), i)).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        agg = sh.groupBy("doc_id").agg(*mins)
        return agg.select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        )

    got_xx = minhash_signatures(docs, num_hashes=8)
    assert _rows(got_xx.select("doc_id", F.col("sig").cast("string"))) == _rows(
        reference(num_hashes=8).select("doc_id", F.col("sig").cast("string"))
    )
    got_af = minhash_signatures(
        docs, num_hashes=8, base_fn=stable_base_p61, perm_fn=affine_perm
    )
    assert _rows(got_af.select("doc_id", F.col("sig").cast("string"))) == _rows(
        reference(base_fn=stable_base_p61, perm_fn=affine_perm, num_hashes=8)
        .select("doc_id", F.col("sig").cast("string"))
    )


def test_near_pair_filter_before_dedup_keeps_pair_set(spark):
    """Filter-then-dropDuplicates == dropDuplicates-then-filter for
    simhash/minhash pair outputs (est/hamming are functions of the pair)."""
    from kgner.operators.dedup import minhash_lsh_pairs, simhash_near_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    sp = simhash_near_pairs(doubled, max_hamming=0)
    assert sp.count() == sp.dropDuplicates(["doc_a", "doc_b"]).count()
    assert sp.filter(F.col("hamming") > 0).count() == 0
    mp = minhash_lsh_pairs(doubled, num_hashes=16, bands=4, threshold=0.999)
    assert mp.count() == mp.dropDuplicates(["doc_a", "doc_b"]).count()
    assert mp.filter(F.col("est_jaccard") < 0.999).count() == 0


def test_spread_scan_bytes_floor(spark):
    """min_bytes_per_core skips the repartition for tiny scans (light-map
    opt-in) but leaves the default heavy-path behavior (always spread a
    single-partition scan) unchanged; results are identical either way."""
    from kgner.operators.partitioning import SPREAD_MIN_BYTES_PER_CORE, spread_scan

    d = spark.read.parquet(f"{SF}/documents.parquet")
    base = d.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism * 2

    # default (heavy-path) behavior: tiny single-file scan is spread
    spread = spread_scan(d, "doc_id")
    assert spread.rdd.getNumPartitions() == target

    # light-map opt-in: the sf0.001 file is far below 32 KB/core * cores,
    # so the exchange is skipped entirely
    guarded = spread_scan(d, "doc_id", min_bytes_per_core=SPREAD_MIN_BYTES_PER_CORE)
    assert guarded.rdd.getNumPartitions() == base

    # a floor of 1 byte/core passes for any non-empty file -> spread again
    assert spread_scan(d, "doc_id", min_bytes_per_core=1).rdd.getNumPartitions() == target

    # row content is unaffected by either path
    assert sorted(r["doc_id"] for r in guarded.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in spread.select("doc_id").collect()
    )
