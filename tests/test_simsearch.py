"""ANN kernel parity: the mapInArrow matrix kernels (scale path) must
agree with the pure-SQL-expr twins (oracle path) on real embeddings.

The expr twins do strict sequential double summation; the kernels use
numpy GEMM/einsum. They can only disagree where a dot product sits
within ~1e-13 of a sign/rounding boundary — which never happens on this
fixed dataset, so the comparisons below are exact, not tolerant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.simsearch import (
    brute_force_pairs,
    cosine_pairs_arrow,
    hyperplanes,
    lsh_pairs,
    lsh_pairs_expr,
    with_sign_bucket,
    with_sign_bucket_arrow,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_sign_bucket_arrow_matches_expr(spark, vecs):
    n_planes, seed = 6, 42
    dim = len(vecs.first()["embedding"])
    expr = with_sign_bucket(vecs, hyperplanes(dim, n_planes, seed)).select(
        "vec_id", "bucket"
    )
    arrow = with_sign_bucket_arrow(vecs, n_planes=n_planes, seed=seed).select(
        "vec_id", "bucket"
    )
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, arrow.collect()))


def test_cosine_pairs_arrow_matches_expr(spark, vecs):
    d = vecs.limit(40)
    a = d.select(F.col("vec_id").alias("src"), F.col("embedding").alias("va"))
    b = d.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    arrow = {
        (r.src, r.dst): r.cos for r in cosine_pairs_arrow(pairs).collect()
    }
    expr = {
        (r.src, r.dst): r.cos
        for r in brute_force_pairs(d, thresh=-2.0).collect()
    }
    assert arrow == expr


def test_lsh_pairs_arrow_matches_expr_twin(spark, vecs):
    got = sorted(map(tuple, lsh_pairs(vecs, thresh=0.45, n_planes=6).collect()))
    want = sorted(map(tuple, lsh_pairs_expr(vecs, thresh=0.45, n_planes=6).collect()))
    assert got == want
    assert len(got) > 0


def test_lsh_pairs_subset_of_brute_force(spark, vecs):
    lsh = {(r.src, r.dst) for r in lsh_pairs(vecs, thresh=0.45, n_planes=6).collect()}
    bf = {(r.src, r.dst) for r in brute_force_pairs(vecs, thresh=0.45).collect()}
    assert lsh <= bf


def test_lsh_plan_has_no_interpreted_lambda_or_driver_probe(spark, vecs):
    plan = lsh_pairs(vecs, thresh=0.45, n_planes=6)._jdf.queryExecution().toString()
    assert "zip_with" not in plan
    assert "aggregate(" not in plan
