"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the sign-LSH bucketed
variant is the scale path (bucket first, search within buckets — turns
the O(N·Q) score matrix into per-bucket joins).

Scale notes:
- the query set is small by construction (vec_id % ANN_QUERY_EVERY == 0)
  → broadcast it; the candidate side streams, so the scoring stage is a
  map-only broadcast-nested-loop, no shuffle of the big side;
- norms are precomputed once per vector;
- dot products run as JVM higher-order functions (zip_with +
  aggregate), not Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textsql import ANN_QUERY_EVERY, ANN_TOP_K


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _with_norm(embeddings: DataFrame) -> DataFrame:
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id", e.alias("e")
    ).withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))


def cosine_topk(
    embeddings: DataFrame,
    query_every: int = ANN_QUERY_EVERY,
    k: int = ANN_TOP_K,
) -> DataFrame:
    """Exact brute-force cosine top-k for the query cohort
    (vec_id % query_every == 0), ties broken by neighbor_id.
    Output: (query_id, rank, neighbor_id)."""
    base = _with_norm(embeddings)
    queries = base.filter(F.col("vec_id") % query_every == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("score", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                F.col("vec_id").alias("neighbor_id"))
    )


NEAR_DUP_COSINE = 0.42  # calibrated to the synthetic corpus (max ~0.51)


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = NEAR_DUP_COSINE
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs — the
    verification-grade path; bucket first with lsh_sign_buckets at
    10^12 scale). Output: (vec_a, vec_b, cos_pct BIGINT)."""
    base = _with_norm(embeddings)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") > threshold)
        .select("vec_a", "vec_b", F.floor(F.col("cos") * 100).cast("long").alias("cos_pct"))
    )


def lsh_plane_signs(n_dims: int, n_planes: int = 8) -> list:
    """Deterministic ±1 hyperplanes: plane j keeps dimension i with
    sign +1 iff md5("{i}|{j}") starts with hex digit 0-7. Shared by the
    Spark operator and the DuckDB oracle (inlined as list literals)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{i}|{j}".encode()).hexdigest()[0] < "8" else -1.0
            for i in range(n_dims)
        ]
        for j in range(n_planes)
    ]


def lsh_sign_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Sign-LSH bucket per vector: bit j = sign of the projection onto a
    deterministic ±1 hyperplane. Bucket-join variant of ANN: at 10^12
    vectors, equal buckets become the join key and brute force runs
    only within buckets. Output: (vec_id, bucket STRING of '0'/'1')."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = embeddings.select("vec_id", e.alias("e"))
    n_dims = df.select(F.size("e").alias("n")).first()["n"]

    bits = []
    for signs in lsh_plane_signs(n_dims, n_planes):
        proj = _dot(F.col("e"), F.array(*[F.lit(s) for s in signs]))
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select("vec_id", F.concat(*bits).alias("bucket"))


IVF_CENTROID_EVERY = 50


def ivf_assign(embeddings: DataFrame, centroid_every: int = IVF_CENTROID_EVERY) -> DataFrame:
    """IVF coarse quantization: centroids are the deterministic cohort
    (vec_id % centroid_every == 0); every vector is assigned to its
    nearest centroid by cosine (ties by centroid id). This is the
    scale path's routing table — search then touches only the probed
    cells. Centroids broadcast; assignment is map-only.
    Output: (vec_id, centroid_id)."""
    base = _with_norm(embeddings)
    centroids = base.filter(F.col("vec_id") % centroid_every == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = base.join(F.broadcast(centroids)).withColumn(
        "score", _dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
