"""Similarity search over embedding columns (array<float>).

brute-force cosine top-k is the exact baseline; sign-LSH bucketing is the
scale path (candidates within a bucket only). Dot products run as
posexplode + sum — JVM-side, no Python. At 10^12 scale you'd pre-bucket
(IVF/LSH) and only brute-force inside buckets, which is exactly the shape
`lsh_buckets` + `cosine_topk` compose into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact top-k by cosine to the row with vec_id=query_vec_id.

    The query vector is a one-row DataFrame joined by dimension position —
    Catalyst broadcasts it, so the big side streams once with no shuffle
    until the final (tiny) top-k sort.
    """
    dims = embeddings.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    qdims = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "qv"))
    )
    scored = (
        dims.join(F.broadcast(qdims), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("nq"),
        )
        .select(
            "vec_id",
            F.round(F.col("dot") / (F.col("nv") * F.col("nq")), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def cosine_topk_zip(embeddings: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact cosine top-k via zip_with/aggregate — the per-row form.

    cosine_topk (above) explodes to (vec, pos) rows and joins by
    dimension: at 10^12 vectors x 64 dims that is a 64x row fan-out plus
    a groupBy shuffle. Here the query vector is collected once (one row,
    64 floats) and inlined as an array literal, so the whole dot product
    runs INSIDE one whole-stage-codegen'd projection over the scan — no
    explode, no join, no aggregation shuffle; the only exchange is the
    final k-row top-k. Same output, same oracle; strictly better plan
    for the single-query case."""
    q = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .head()[0]
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    nq = float(sum(x * x for x in q)) ** 0.5
    v = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, qlit, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    nv = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = embeddings.select(
        "vec_id", F.round(dot / (nv * F.lit(nq)), 6).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def ivf_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10,
             n_centroids: int = 8) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest centroid, then search
    only the query's cell — the scale path where brute force won't.

    Centroids are the first `n_centroids` vectors (deterministic stand-in
    for a k-means codebook; at 10^12 scale you'd train the codebook on a
    sample and broadcast it exactly like this). Plan shape: one broadcast
    join against the tiny centroid set, a per-vector argmax (window), and
    brute-force cosine INSIDE one cell only.
    """
    dims = embeddings.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    cdims = (
        embeddings.filter(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").alias("cid"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "cv"),
        )
    )
    def assign_dot(d: DataFrame) -> DataFrame:
        dots = (
            d.join(F.broadcast(cdims), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.round(F.sum(F.col("v") * F.col("cv")), 9).alias("dot"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cid"))
        return (
            dots.select("vec_id", "cid", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cid").alias("cluster"))
        )

    # the query's cell needs ONE vector's assignment — filter BEFORE the
    # argmin so the full-corpus assignment subtree runs once, not twice
    # (reusing one `assign` frame for both branches recomputes it)
    query_cluster = assign_dot(dims.filter(F.col("vec_id") == query_vec_id)).select(
        F.col("cluster").alias("qcluster")
    )
    candidates = assign_dot(dims).join(
        F.broadcast(query_cluster), F.col("cluster") == F.col("qcluster")
    ).select("vec_id")
    cell = embeddings.join(candidates, "vec_id")
    return cosine_topk_against(cell, embeddings, query_vec_id, k)


def cosine_topk_against(candidates: DataFrame, embeddings: DataFrame,
                        query_vec_id: int, k: int) -> DataFrame:
    """Exact cosine top-k of `candidates` against one query row."""
    dims = candidates.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    qdims = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "qv"))
    )
    scored = (
        dims.join(F.broadcast(qdims), "pos")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("nq"),
        )
        .select(
            "vec_id",
            F.round(F.col("dot") / (F.col("nv") * F.col("nq")), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _explode_dims(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )


def _assign(dims: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by squared L2. Per-vector ||v||^2 is
    constant across centroids, so argmin(||v-c||^2) == argmin(||c||^2 -
    2<v,c>) and the big per-vector norm never needs computing. The
    centroid table is tiny (k x d rows) -> broadcast; the only shuffle is
    the partial-aggregated groupBy(vec_id, cid)."""
    c2 = cent.groupBy("cid").agg(F.sum(F.col("cv") * F.col("cv")).alias("c2"))
    dots = (
        dims.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cid")
        .agg(F.sum(F.col("v") * F.col("cv")).alias("dot"))
    )
    keyed = dots.join(F.broadcast(c2), "cid").select(
        "vec_id", "cid", F.round(F.col("c2") - 2 * F.col("dot"), 9).alias("dist_key")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist_key"), F.asc("cid"))
    return (
        keyed.select("vec_id", "cid", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster"))
    )


def kmeans_codebook(embeddings: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """Distributed Lloyd's k-means codebook -> (cid, pos, cv) exploded.

    Deterministic init (the first k vec_ids), fixed iteration count so the
    DuckDB oracle can unroll the same rounds as CTEs. Each round is one
    broadcast join against the k x d centroid table plus two map-side-
    combined groupBys; nothing driver-side, no collect. Centroid
    coordinates round to 6 dp per round so both engines quantize float
    noise identically. localCheckpoint truncates the per-round lineage.
    At 10^12 scale you'd train on a sample table; the plan is unchanged."""
    dims = _explode_dims(embeddings)
    cent = dims.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), "pos", F.col("v").alias("cv")
    )
    for _ in range(iters):
        assign = _assign(dims, cent)
        cent = (
            dims.join(assign, "vec_id")
            .groupBy(F.col("cluster").alias("cid"), F.col("pos"))
            .agg(F.round(F.avg("v"), 6).alias("cv"))
            .localCheckpoint()
        )
    return cent


def ivf_topk_kmeans(embeddings: DataFrame, query_vec_id: int, k: int = 10,
                    n_centroids: int = 8, iters: int = 2) -> DataFrame:
    """IVF ANN with a trained k-means codebook (upgrades ivf_topk's
    first-n stand-in): train centroids, assign every vector to its cell,
    brute-force cosine only inside the query's cell."""
    cent = kmeans_codebook(embeddings, k=n_centroids, iters=iters)
    # query's cell from one vector's assignment (filter pushes to the
    # scan); the corpus-wide assignment subtree then runs exactly once
    query_cluster = _assign(
        _explode_dims(embeddings.filter(F.col("vec_id") == query_vec_id)), cent
    ).select(F.col("cluster").alias("qcluster"))
    candidates = _assign(_explode_dims(embeddings), cent).join(
        F.broadcast(query_cluster), F.col("cluster") == F.col("qcluster")
    ).select("vec_id")
    cell = embeddings.join(candidates, "vec_id")
    return cosine_topk_against(cell, embeddings, query_vec_id, k)


def knn_join(embeddings: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Batch k-NN join: exact cosine top-k against the corpus for EVERY
    query in a small id set at once -> (qid, vec_id, cosine, rank).

    One corpus pass regardless of |Q|: the Q x d query-dim table
    broadcasts, the per-(qid, vec) partials map-side combine, and the
    final per-qid rank is a window over k x |Q| rows. The single-query
    cosine_topk is the |Q|=1 special case; this is the shape an
    eval-retrieval job (thousands of queries vs a 100-TB corpus) needs,
    where running cosine_topk per query would rescan the corpus |Q| times.
    """
    dims = _explode_dims(embeddings)
    qdims = dims.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), "pos", F.col("v").alias("qv")
    )
    scored = (
        dims.join(F.broadcast(qdims), "pos")
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("nq"),
        )
        .select(
            "qid",
            "vec_id",
            F.round(F.col("dot") / (F.col("nv") * F.col("nq")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.select("qid", "vec_id", "cosine", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def lsh_sign_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-projection LSH: bucket = sign bits of the first n dims.

    (With learned/random planes you'd dot against broadcast plane vectors;
    axis-aligned planes keep the oracle SQL-expressible while exercising
    the identical plan shape.) Returns bucket occupancy — the IVF-style
    candidate-list sizes."""
    bits = [
        F.when(F.element_at("embedding", i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_planes)
    ]
    return (
        embeddings.select(F.concat(*bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )
