"""Hash parity python↔Spark — everything downstream depends on this
(SURVEY.md §7 M0: doc ids, oracle replays, band keys)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dedup.hashing import (
    minhash_from_hashes,
    mix64,
    perm_consts,
    simhash_from_hashes,
    xxh64_long,
    xxh64_str,
)

STRINGS = [
    "",
    "a",
    "abcd",
    "abcdefgh",
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 100,
    "ünïcødé — ありがとう ✓",
    "w042 w001 w377",
    "https://src3.example.org/p/deadbeef1234",
    "tab\tnewline\nmixed",
    "0123456789" * 20,
]

LONGS = [0, 1, -1, 42, -42, 2**62, -(2**62), 123456789012345]


def test_xxh64_str_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in STRINGS:
        assert got[s] == xxh64_str(s), f"xxh64 parity failed for {s!r}"


def test_xxh64_long_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], ["v"])
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in LONGS:
        assert got[v] == xxh64_long(v), f"xxh64 long parity failed for {v}"


def test_mix64_bijective_sample():
    x = np.random.default_rng(0).integers(0, 1 << 63, size=10000, dtype=np.uint64)
    assert len(np.unique(mix64(x))) == len(np.unique(x))


def test_perm_consts_deterministic_and_odd():
    a = perm_consts(128, 42)
    b = perm_consts(128, 42)
    assert (a == b).all()
    assert (a % 2 == 1).all()
    assert len(np.unique(a)) == 128


def test_minhash_properties():
    consts = perm_consts(128, 42)
    rng = np.random.default_rng(1)
    a = rng.integers(-(1 << 62), 1 << 62, size=500, dtype=np.int64)
    sig_a = minhash_from_hashes(a, consts)
    # permutation-invariance over input order
    assert (minhash_from_hashes(a[::-1].copy(), consts) == sig_a).all()
    # identical sets → identical signatures; estimate of J(a,a)=1
    assert (minhash_from_hashes(np.concatenate([a, a[:100]]), consts) == sig_a).all()
    # estimate tracks true Jaccard within ±0.15 at 128 perms
    b = np.concatenate([a[:400], rng.integers(-(1 << 62), 1 << 62, size=100, dtype=np.int64)])
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est = (sig_a == minhash_from_hashes(b, consts)).mean()
    assert abs(est - true_j) < 0.15


def test_minhash_empty_sentinel():
    consts = perm_consts(16, 42)
    sig = minhash_from_hashes(np.array([], dtype=np.int64), consts)
    assert (sig == np.iinfo(np.uint64).max).all()


def test_simhash_basic():
    rng = np.random.default_rng(2)
    a = rng.integers(-(1 << 62), 1 << 62, size=300, dtype=np.int64)
    sa = simhash_from_hashes(a)
    assert simhash_from_hashes(a[::-1].copy()) == sa  # order-invariant
    assert simhash_from_hashes(np.array([], dtype=np.int64)) == 0
    # small perturbation → small hamming distance
    b = a.copy()
    b[:10] = rng.integers(-(1 << 62), 1 << 62, size=10, dtype=np.int64)
    sb = simhash_from_hashes(b)
    ham = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
    assert ham <= 12


def test_batch_signatures_bit_match_per_doc():
    """minhash_batch/simhash_batch (the Arrow-batch fast path) must be
    bit-identical to the per-doc reference functions, including empty
    docs at every position."""
    import numpy as np

    from dedup.hashing import (
        minhash_batch,
        minhash_from_hashes,
        perm_consts,
        simhash_batch,
        simhash_from_hashes,
    )

    rng = np.random.default_rng(7)
    consts = perm_consts(128, 42)
    for _ in range(10):
        sizes = rng.integers(0, 60, size=int(rng.integers(1, 10)))
        arrs = [
            rng.integers(-(2**63), 2**63 - 1, size=int(n), dtype=np.int64)
            for n in sizes
        ]
        lengths = np.array([a.size for a in arrs])
        flat = (
            np.concatenate(arrs) if len(arrs) else np.empty(0, dtype=np.int64)
        )
        mb = minhash_batch(flat, lengths, consts)
        sb = simhash_batch(flat, lengths)
        for i, a in enumerate(arrs):
            assert (mb[i] == minhash_from_hashes(a, consts)).all()
            assert sb[i] == simhash_from_hashes(a)
