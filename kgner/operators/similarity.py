"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline; JVM-side dot product via
  F.aggregate/zip_with (no Python in the hot path), window top-k.
- LSH-bucketed (random hyperplane / signed random projection) variant: the
  scale path — candidates only meet if they share a hyperplane-sign bucket,
  verified by exact cosine. Hyperplanes derive from xxhash64 of (dim, plane)
  so they're deterministic WITHOUT shipping a matrix.
- embedding-cosine near-dup for dedup pipelines: same machinery, threshold
  instead of top-k.

Scale notes: brute force is O(Q*N) — fine for Q small (probe queries),
disastrous for all-pairs; the LSH path turns all-pairs into per-bucket
blocks. At 100 TB one would use IVF with learned centroids; the bucketing
below is the same join topology with data-independent centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    vec_id: str = "vec_id",
    qcol: str = "embedding",
    vcol: str = "embedding",
) -> DataFrame:
    """-> (query_id, rank, vec_id, cosine). Queries are broadcast (small);
    the scan side never shuffles until the per-query top-k window."""
    q = F.broadcast(
        queries.select(F.col(query_id), F.col(qcol).alias("__q"))
    )
    scored = vectors.select(F.col(vec_id), F.col(vcol).alias("__v")).crossJoin(q)
    scored = scored.select(
        query_id,
        vec_id,
        cosine_col(F.col("__q"), F.col("__v")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", vec_id, "cosine")
    )


def _plane_matrix(dim: int, planes: int, bands: int = 1) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes, (bands, planes, dim) in
    [-1, 1], derived from md5(plane_id:dim_id) — no RNG state to ship, any
    worker/driver can regenerate the identical matrix."""
    import hashlib

    out = []
    for band in range(bands):
        rows = []
        for p in range(planes):
            plane_id = band * planes + p
            row = []
            for d in range(dim):
                h = hashlib.md5(f"{plane_id}:{d}".encode()).digest()
                v = int.from_bytes(h[:8], "big") % 20015
                row.append((v - 10007) / 10007.0)
            rows.append(row)
        out.append(rows)
    return out


def _with_band_buckets(
    vectors: DataFrame, dim: int, planes: int, bands: int, vcol: str
) -> DataFrame:
    """Add `buckets: array<long>` (one per band, disjoint id spaces).

    The plane matrix travels as DATA — a broadcast one-row DataFrame crossed
    into the scan — so the Catalyst plan has a CONSTANT node count regardless
    of dim/planes/bands. (The previous shape inlined one expression node per
    vector dimension per plane: ~18-37k nodes at dim=768-1536 — analysis
    blow-up + codegen bailout.)
    """
    spark = vectors.sparkSession
    mat = _plane_matrix(dim, planes, bands)
    planes_df = spark.createDataFrame(
        [(mat,)], "__planes array<array<array<double>>>"
    )
    powers = F.lit([1 << i for i in range(planes)])  # tiny: `planes` literals
    band_bucket = lambda band_planes: F.aggregate(  # noqa: E731
        F.zip_with(
            F.transform(
                band_planes,
                lambda p: (_dot(F.col(vcol), p) >= 0).cast("long"),
            ),
            powers,
            lambda b, w: b * w.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        vectors.crossJoin(F.broadcast(planes_df))
        .withColumn(
            "buckets",
            F.transform(
                F.col("__planes"),
                lambda bp, i: band_bucket(bp)
                + i.cast("long") * F.lit(1 << planes).cast("long"),
            ),
        )
        .drop("__planes")
    )


def lsh_bucket(vectors: DataFrame, dim: int, planes: int = 8, vcol: str = "embedding") -> DataFrame:
    """Add a `bucket` column = integer of `planes` hyperplane signs."""
    return (
        _with_band_buckets(vectors, dim, planes, 1, vcol)
        .withColumn("bucket", F.col("buckets").getItem(0))
        .drop("buckets")
    )


def lsh_topk(
    queries: DataFrame,
    vectors: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 6,
    query_id: str = "query_id",
    vec_id: str = "vec_id",
    qcol: str = "embedding",
    vcol: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket,
    verified by exact cosine. Recall tunes with `planes` (fewer planes =
    bigger buckets = higher recall, more compute)."""
    qb = F.broadcast(
        lsh_bucket(queries.select(query_id, F.col(qcol).alias("__q")), dim, planes, "__q")
    )
    vb = lsh_bucket(vectors.select(vec_id, F.col(vcol).alias("__v")), dim, planes, "__v")
    scored = vb.join(qb, "bucket").select(
        query_id, vec_id, cosine_col(F.col("__q"), F.col("__v")).alias("cosine")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", vec_id, "cosine")
    )


def sampled_centroids(
    vectors: DataFrame, n: int, vec_id: str = "vec_id", vcol: str = "embedding"
) -> DataFrame:
    """Deterministic centroid stand-in: the n smallest-id vectors. At scale
    the centroids come from k-means over a sample; ivf_topk takes ANY small
    (centroid_id, embedding) frame, so swapping in learned centroids is a
    drop-in."""
    return (
        vectors.orderBy(F.col(vec_id).asc())
        .limit(n)
        .select(F.col(vec_id).alias("centroid_id"), F.col(vcol).alias("embedding"))
    )


def ivf_topk(
    queries: DataFrame,
    vectors: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
    vec_id: str = "vec_id",
    qcol: str = "embedding",
    vcol: str = "embedding",
    broadcast_probes: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN: the data-dependent refinement of the
    hyperplane LSH path — same bucket-equi-join topology, but cells follow
    the data distribution (IVF_FLAT).

    broadcast_probes: True (default) for the lookup shape — few queries
    against a big corpus; the probe side (n_queries x nprobe rows, each
    carrying the query vector) broadcasts and the corpus joins map-only.
    Set False for all-pairs-style uses (queries ~ corpus) where the probe
    side is too big to broadcast — the cell join then shuffles both sides.

    1. ASSIGN: each corpus vector goes to its nearest centroid by cosine
       (round-6 with centroid-id tiebreak, so the assignment is exactly
       reproducible by the SQL oracle). The centroid table is a model-sized
       artifact: it ships as ONE broadcast row of structs, the argmin is a
       per-row array expression — map-only, no shuffle, constant plan size
       (the _with_band_buckets trick).
    2. PROBE: each query ranks the same centroids and takes the `nprobe`
       nearest cells.
    3. exact cosine within probed cells, window top-k.

    At 100 TB: assignment is one map pass; the probe join touches roughly
    nprobe/n_centroids of the corpus; hot cells are the skew axis (use more
    centroids, or AQE skew split on the cell join).
    """
    spark = vectors.sparkSession
    cent_rows = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in centroids.select("centroid_id", "embedding").collect()
    ]
    cent_df = spark.createDataFrame(
        [(cent_rows,)], "__cents array<struct<cid:bigint, v:array<double>>>"
    )

    def scored_cells(col_vec):
        # struct<negcos, cid> orders lexicographically == cosine desc, cid asc
        return F.transform(
            F.col("__cents"),
            lambda s: F.struct(
                (-F.round(cosine_col(s["v"], col_vec), 6)).alias("negcos"),
                s["cid"].alias("cid"),
            ),
        )

    def ranked_cells(col_vec):
        return F.array_sort(scored_cells(col_vec))

    assigned = (
        vectors.select(vec_id, F.col(vcol).alias("__v"))
        .crossJoin(F.broadcast(cent_df))
        # assignment only needs the argmin: array_min is one O(C) pass per
        # corpus row — this IS the map pass over the whole corpus, so no
        # O(C log C) sort + struct-array materialization here (the probe
        # side below sorts, but over the tiny query set)
        .withColumn("cell", F.array_min(scored_cells(F.col("__v")))["cid"])
        .drop("__cents")
    )
    probed = (
        queries.select(query_id, F.col(qcol).alias("__q"))
        .crossJoin(F.broadcast(cent_df))
        .select(
            query_id,
            "__q",
            F.explode(
                F.transform(
                    F.slice(ranked_cells(F.col("__q")), 1, nprobe),
                    lambda s: s["cid"],
                )
            ).alias("cell"),
        )
    )
    # corpus side stays put; the probe side (n_queries x nprobe rows) is the
    # small side of an ANN lookup — broadcast it so the cell join is map-only
    # over the assigned corpus (no corpus shuffle)
    if broadcast_probes:
        probed = F.broadcast(probed)
    scored = assigned.join(probed, "cell").select(
        query_id,
        vec_id,
        F.round(cosine_col(F.col("__q"), F.col("__v")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(vec_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", vec_id, "cosine")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int = 6,
    bands: int = 4,
    vec_id: str = "vec_id",
    vcol: str = "embedding",
) -> DataFrame:
    """All-pairs near-dup via multi-band LSH blocking + exact cosine verify.

    -> (vec_a, vec_b, cosine) with vec_a < vec_b, cosine >= threshold.

    Recall math: at cosine c, a single hyperplane disagrees with prob
    θ/π (θ = arccos c), so one band of `planes` bits catches a pair with
    p = (1-θ/π)^planes. A SINGLE band misses ~47% of 0.95-cosine pairs at
    planes=6; OR-ing `bands` independent bands (disjoint plane ids) lifts
    recall to 1-(1-p)^bands ≈ 0.92 at the defaults. Cost scales linearly in
    bands; candidates verified by exact cosine either way so precision is
    unaffected.
    """
    src = vectors.select(vec_id, F.col(vcol).alias("__v"))
    # ONE scan computes every band's bucket (array<long>), then posexplode —
    # the old shape unioned `bands` scans of the source. Bucket id spaces are
    # disjoint per band (offset by band * 2^planes inside _with_band_buckets).
    banded = (
        _with_band_buckets(src, dim, planes, bands, "__v")
        .select(vec_id, "__v", F.explode("buckets").alias("bucket"))
        .localCheckpoint(eager=False)
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{vec_id}") < F.col(f"b.{vec_id}")),
        )
        .select(
            F.col(f"a.{vec_id}").alias("vec_a"),
            F.col(f"b.{vec_id}").alias("vec_b"),
            F.col("a.__v").alias("__va"),
            F.col("b.__v").alias("__vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .select(
            "vec_a",
            "vec_b",
            cosine_col(F.col("__va"), F.col("__vb")).alias("cosine"),
        )
    )
    return cands.filter(F.col("cosine") >= threshold)
