"""Candidate generation: LSH band-bucket self-join + SimHash Hamming
blocks (SURVEY.md §2 D1/D4/E4), with hot-bucket accounting.

Scale notes: the self-equi-join on (band, band_hash) is a shuffled hash
/ sort-merge join on exactly the blocking key — Catalyst picks the
physical strategy, AQE splits skewed partitions at runtime. What AQE
canNOT fix is a single mega-key (one boilerplate bucket with 10^6
docs ⇒ 10^12 pairs); that is handled upstream by ``bucket_stats`` +
``cap_buckets`` (a recall-accounted cap, logged in metrics) and by the
salted variant in skew.py. The length-ratio conjunct (D4) is attached
to the same equi-join, so it stays hash/SMJ — never a nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup.config import DedupConfig


def bucket_stats(bands: DataFrame) -> DataFrame:
    """Bucket sizes per (band, band_hash) — drives cap/salt decisions
    and the hot-bucket metrics."""
    return bands.groupBy("band", "band_hash").agg(F.count("*").alias("bucket_size"))


def cap_buckets(bands: DataFrame, cap: int) -> tuple[DataFrame, DataFrame]:
    """Drop buckets larger than ``cap`` (0 = off). Returns (kept bands,
    dropped-bucket stats for metrics). Pair blowup is quadratic in
    bucket size; a cap is the documented, recall-accounted guard
    (SURVEY §4.2) — the recall gate runs with caps off."""
    if cap <= 0:
        return bands, bucket_stats(bands).filter(F.lit(False))
    stats = bucket_stats(bands)
    hot = stats.filter(F.col("bucket_size") > cap)
    kept = bands.join(
        F.broadcast(hot.select("band", "band_hash")), ["band", "band_hash"], "left_anti"
    )
    return kept, hot


def length_ratio_conjunct(thresh: float) -> F.Column:
    """J(A,B) ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|): exact-safe pruning,
    attached as a non-equi conjunct to the equi-join (SURVEY §2 D4)."""
    return F.least("src_n", "dst_n") >= F.greatest("src_n", "dst_n") * F.lit(thresh)


def lsh_candidates(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Self-equi-join of bands on (band, band_hash) → distinct candidate
    pairs (src < dst canonical), length-ratio pruned."""
    a = bands.select(
        "band",
        "band_hash",
        F.col("doc_id").alias("src"),
        F.col("n_shingles").alias("src_n"),
    )
    b = bands.select(
        "band",
        "band_hash",
        F.col("doc_id").alias("dst"),
        F.col("n_shingles").alias("dst_n"),
    )
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("src") < F.col("dst"))
        .filter(length_ratio_conjunct(cfg.jaccard_thresh))
    )
    return pairs.select("src", "dst").dropDuplicates(["src", "dst"])


def simhash_candidates(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """SimHash Hamming-≤h candidates via pigeonhole chunk blocking:
    split the 64-bit simhash into (h+1) chunks — any pair within
    Hamming distance h agrees on at least one chunk — equi-join on
    (chunk_idx, chunk_val), then filter bit_count(xor) ≤ h. All pure
    SQL (SURVEY §2 E4)."""
    n_chunks = cfg.hamming_thresh + 1
    width = cfg.simhash_bits // n_chunks
    chunks = F.expr(
        f"transform(sequence(0, {n_chunks - 1}),"
        f" i -> struct(i as idx, shiftright(simhash, i*{width}) & {(1 << width) - 1} as val))"
    )
    ex = signatures.select(
        "doc_id", "simhash", "n_shingles", F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        "simhash",
        "n_shingles",
        F.col("c.idx").alias("idx"),
        F.col("c.val").alias("val"),
    )
    a = ex.select(
        "idx", "val", F.col("doc_id").alias("src"),
        F.col("simhash").alias("sim_a"), F.col("n_shingles").alias("src_n"),
    )
    b = ex.select(
        "idx", "val", F.col("doc_id").alias("dst"),
        F.col("simhash").alias("sim_b"), F.col("n_shingles").alias("dst_n"),
    )
    return (
        a.join(b, ["idx", "val"])
        .filter(F.col("src") < F.col("dst"))
        # exact-safe length-ratio prune (D4): these candidates only feed
        # the J ≥ thresh verifier, and J ≥ t bounds the size ratio — it
        # caps the quadratic chunk-collision ball around boilerplate
        .filter(length_ratio_conjunct(cfg.jaccard_thresh))
        .filter(F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= cfg.hamming_thresh)
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
