"""Hot-bucket skew handling: the salted LSH self-join (SURVEY.md §2 D2,
BASELINE.json:6 "LSH band-bucket blocking as a salted hash join").

Why AQE is not enough: AQE's skew-join splits oversized PARTITIONS, but
a single boilerplate LSH bucket is ONE join key — every row of it hashes
to the same task, and the pair blowup inside is quadratic. The fix is
semantic, not physical: split each hot bucket into ``n_salt`` blocks by
a deterministic row salt, keep the probe side un-replicated on its own
block, and replicate the build side across all blocks. Every pair
(x, y) then meets exactly once — at block == salt(x) — so the salted
join emits EXACTLY the pair set of the plain join (asserted by
tests/test_skew.py set-equality), while the biggest task shrinks from
|bucket|² to |bucket|²/n_salt.

Cold buckets take the normal equi-join path untouched; the hot-key set
is tiny by construction (buckets above a count threshold) and is
broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup.candidates import bucket_stats, length_ratio_conjunct
from dedup.config import DedupConfig

_KEYS = ["band", "band_hash"]


def split_hot_cold(bands: DataFrame, hot_thresh: int) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(hot rows, cold rows, hot-key frame). Hot = bucket size > thresh."""
    hot_keys = (
        bucket_stats(bands).filter(F.col("bucket_size") > hot_thresh).select(*_KEYS)
    )
    hot = bands.join(F.broadcast(hot_keys), _KEYS, "left_semi")
    cold = bands.join(F.broadcast(hot_keys), _KEYS, "left_anti")
    return hot, cold, hot_keys


def _pair_join(a: DataFrame, b: DataFrame, on: list[str], thresh: float) -> DataFrame:
    pairs = (
        a.join(b, on)
        .filter(F.col("src") < F.col("dst"))
        .filter(length_ratio_conjunct(thresh))
    )
    return pairs.select("src", "dst")


def _sides(bands: DataFrame) -> tuple[DataFrame, DataFrame]:
    a = bands.select(
        *_KEYS, F.col("doc_id").alias("src"), F.col("n_shingles").alias("src_n")
    )
    b = bands.select(
        *_KEYS, F.col("doc_id").alias("dst"), F.col("n_shingles").alias("dst_n")
    )
    return a, b


def salted_lsh_candidates(
    bands: DataFrame, cfg: DedupConfig, dedupe: bool = True
) -> DataFrame:
    """Skew-safe candidate pairs: plain equi-join for cold buckets,
    salted block join for hot ones. Pair-set-identical to
    ``candidates.lsh_candidates`` at any salt/threshold setting.
    ``dedupe=False`` defers the pair-distinct to after the est filter
    (see ``lsh_candidates``)."""
    n = cfg.n_salt
    thresh = cfg.salt_hot_thresh
    if thresh <= 0:
        from dedup.candidates import lsh_candidates

        return lsh_candidates(bands, cfg, dedupe=dedupe)

    hot, cold, _keys = split_hot_cold(bands, thresh)

    cold_a, cold_b = _sides(cold)
    cold_pairs = _pair_join(cold_a, cold_b, _KEYS, cfg.jaccard_thresh)

    # hot path: probe side keeps its own block = pmod(xxhash64(doc_id), n)
    # (deterministic row salt); build side is replicated to every block.
    hot_a, hot_b = _sides(hot)
    salted_a = hot_a.withColumn("block", F.pmod(F.xxhash64("src"), F.lit(n)))
    replicated_b = hot_b.withColumn(
        "block", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    hot_pairs = _pair_join(
        salted_a, replicated_b, [*_KEYS, "block"], cfg.jaccard_thresh
    )

    out = cold_pairs.unionByName(hot_pairs)
    return out.dropDuplicates(["src", "dst"]) if dedupe else out
