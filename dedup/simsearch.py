"""Similarity search over embedding columns (prompt-mandated ANN ops).

Baseline: brute-force cosine — pure SQL higher-order functions
(``zip_with`` dot product + ``aggregate`` sum), JVM-side, no Python.
Scale path: random-hyperplane LSH bucketing (Charikar 2002) — sign-bit
signatures computed once per vector, candidates restricted to matching
buckets, exact cosine re-ranked only inside buckets. At 100 TB the
brute-force O(n·q) join is only for small query sets against a
broadcastable query side; the LSH variant is the shuffle-bounded path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Σ aᵢ·bᵢ over two array<float/double> columns, in double — pure SQL."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str | F.Column) -> F.Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Cosine similarity in double precision. Float32 inputs are upcast
    element-wise BEFORE multiply so the arithmetic bit-matches any other
    engine doing float32→double reads (e.g. the DuckDB oracle)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_pairs(vecs: DataFrame, thresh: float, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine ≥ thresh (src < dst canonical). O(n²) —
    correctness baseline / oracle twin; use lsh_pairs at scale."""
    a = vecs.select(F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("src") < F.col("dst"))
        .withColumn("cos", F.round(cosine_expr("va", "vb"), 4))
        .filter(F.col("cos") >= thresh)
        .select("src", "dst", "cos")
    )


def topk_neighbors(vecs: DataFrame, queries: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. The query side
    is broadcast (small by contract); ranking is a window over the
    per-query partitions. Deterministic: ties broken by neighbor id on
    the ROUNDED cosine so cross-engine float noise cannot flip ranks."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    n = vecs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        n.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", F.round(cosine_expr("qv", "nv"), 4))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes for sign-bit LSH, as plain literals
    (broadcast inside the expression tree, no side channel)."""
    r = np.random.default_rng(seed)
    return r.standard_normal((n_planes, dim)).round(6).tolist()


def with_sign_bucket(vecs: DataFrame, planes: list[list[float]],
                     vec_col: str = "embedding") -> DataFrame:
    """Attach the sign-bit bucket id: bit j = 1 iff v·h_j ≥ 0. Vectors in
    the same bucket are cosine-close with high probability; collision
    prob for angle θ is (1-θ/π)^n_planes."""
    bucket = F.lit(0).cast("long")
    for j, h in enumerate(planes):
        hcol = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(dot_expr(vec_col, hcol) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << j))
    return vecs.withColumn("bucket", bucket)


def lsh_pairs(vecs: DataFrame, thresh: float, n_planes: int = 8, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate near-dup pairs: bucket join on the sign signature,
    exact cosine verification inside buckets. The self-join shuffles on
    the bucket key only — the 100 TB path (vs brute_force_pairs'
    cartesian). Recall is tunable via n_planes (fewer planes = bigger
    buckets = higher recall, more verify work)."""
    dim = len(vecs.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = with_sign_bucket(vecs, planes, vec_col)
    a = bucketed.select("bucket", F.col(id_col).alias("src"), F.col(vec_col).alias("va"))
    b = bucketed.select("bucket", F.col(id_col).alias("dst"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("src") < F.col("dst"))
        .withColumn("cos", F.round(cosine_expr("va", "vb"), 4))
        .filter(F.col("cos") >= thresh)
        .select("src", "dst", "cos")
    )
