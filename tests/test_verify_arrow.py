"""Parity tests: the Arrow-vectorized pair-verification kernels used in
the pipeline hot path must agree bit-for-bit with the pure-SQL
higher-order-function expressions (which remain the oracle-twin qkey
surface). Random signatures/shingle sets, both code paths on the same
frames, sorted collected rows compared exactly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dedup.verify import (
    _est_agreement_arrow,
    _exact_jaccard_arrow,
    est_jaccard_expr,
    exact_jaccard_expr,
)

NUM_PERM = 16


@pytest.fixture(scope="module")
def pair_frames(spark):
    rng = random.Random(7)
    rows = []
    for pid in range(200):
        # signatures with controlled agreement; shingles sorted unsigned
        mh_a = [rng.randrange(-(2**62), 2**62) for _ in range(NUM_PERM)]
        mh_b = [
            v if rng.random() < 0.5 else rng.randrange(-(2**62), 2**62)
            for v in mh_a
        ]
        pool = [rng.randrange(-(2**63), 2**63 - 1) for _ in range(60)]
        sa = sorted(rng.sample(pool, rng.randint(1, 40)), key=lambda x: x % 2**64)
        sb = sorted(rng.sample(pool, rng.randint(1, 40)), key=lambda x: x % 2**64)
        rows.append((pid, pid + 1_000_000, 0.5, mh_a, mh_b, sa, sb))
    return spark.createDataFrame(
        rows,
        "src long, dst long, est_jacc double, mh_a array<long>, "
        "mh_b array<long>, sh_a array<long>, sh_b array<long>",
    )


def test_est_agreement_arrow_matches_sql_expr(pair_frames):
    got = {
        (r.src, r.dst): r.est_jacc
        for r in _est_agreement_arrow(pair_frames, NUM_PERM).collect()
    }
    want = {
        (r.src, r.dst): r.est
        for r in pair_frames.select(
            "src", "dst", est_jaccard_expr(num_perm=NUM_PERM).alias("est")
        ).collect()
    }
    assert got == want


def test_exact_jaccard_arrow_matches_sql_expr(pair_frames):
    got = {
        (r.src, r.dst): r.sim for r in _exact_jaccard_arrow(pair_frames).collect()
    }
    want = {
        (r.src, r.dst): r.sim
        for r in pair_frames.select(
            "src", "dst", exact_jaccard_expr().alias("sim")
        ).collect()
    }
    assert got == want
    # est_jacc column passes through unchanged
    ests = {r.est_jacc for r in _exact_jaccard_arrow(pair_frames).collect()}
    assert ests == {0.5}
