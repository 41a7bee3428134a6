"""Signature stage: shingles → MinHash + SimHash (SURVEY.md §2 C1-C4).

Division of labor, chosen deliberately for scale:

- **Shingle hashing stays JVM-side** as a pure SQL higher-order
  expression (``transform(sequence(...), i -> xxhash64(substring(...)))``)
  — whole-stage codegen, no Arrow crossing, and the hash function is
  Spark's own xxhash64 so it is identical everywhere by definition.
- **MinHash/SimHash cross to Python once**, as `array<long>` shingle
  hashes through an iterator-form pandas UDF (Arrow batches), where the
  numpy cores in hashing.py do matrix min / bit votes. One crossing,
  vectorized both sides — this is the "batched shingling, MinHash and
  SimHash in vectorized pandas/Arrow UDFs" demanded by BASELINE.json:6.
- **Band keys are again pure SQL** (slice + xxhash64 over array),
  exploded JVM-side.

Committed signature tables are ``repartitionByRange`` on (minhash[0],
doc_id) via ``range_partition_by_sig_prefix`` (BASELINE.json:6): range-
clusters similar docs and gives deterministic file clustering. It is a
SINK-side step — range partitioning samples its child, so doing it
mid-pipeline would evaluate the signature UDF twice.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

from dedup.config import DedupConfig
from dedup.hashing import minhash_batch, perm_consts, simhash_batch


def shingles_expr(text_col: str, k: int) -> F.Column:
    """Distinct hashed char k-grams of ``text_col`` as array<long>.
    Texts shorter than k yield the single shingle hash of the whole
    text (pinned rule, mirrored by the oracle)."""
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f"  i -> xxhash64(substring({text_col}, i, {k}))))"
    )


def with_shingles(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """docs(doc_id, norm_text, …) → shingles frame (schema.SHINGLES)."""
    return docs.select(
        "doc_id",
        shingles_expr("norm_text", cfg.k).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))


_SIG_STRUCT = StructType(
    [
        StructField("minhash", ArrayType(LongType(), False), False),
        StructField("simhash", LongType(), False),
    ]
)


def _make_sig_udf(num_perm: int, perm_seed: int):
    """Iterator-form pandas UDF: shingle-hash arrays → struct(minhash,
    simhash). Iterator form amortizes the permutation-constant setup per
    Arrow batch stream (SURVEY §2 K1); inside a batch the whole
    signature computation is ONE flattened numpy pass (segment-min /
    segment-vote via ``reduceat``, hashing.minhash_batch) — no
    per-document Python loop anywhere."""

    @F.pandas_udf(_SIG_STRUCT)
    def sig_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        consts = perm_consts(num_perm, perm_seed)
        for sh in batches:
            arrs = [np.asarray(a, dtype=np.int64) for a in sh]
            lengths = np.array([a.size for a in arrs], dtype=np.int64)
            flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
            mh = minhash_batch(flat, lengths, consts).view(np.int64)
            simh = simhash_batch(flat, lengths)
            yield pd.DataFrame(
                {"minhash": list(mh), "simhash": simh}
            )

    return sig_udf


def with_signatures(shingles: DataFrame, cfg: DedupConfig) -> DataFrame:
    """shingles → signatures frame (schema.SIGNATURES)."""
    sig_udf = _make_sig_udf(cfg.num_perm, cfg.perm_seed)
    return shingles.select(
        "doc_id",
        sig_udf(F.col("shingles")).alias("sig"),
        "n_shingles",
    ).select(
        "doc_id",
        F.col("sig.minhash").alias("minhash"),
        F.col("sig.simhash").alias("simhash"),
        "n_shingles",
    )


def range_partition_by_sig_prefix(sigs: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """``repartitionByRange`` on (minhash[0], doc_id) — the BASELINE.json:6
    signature-prefix range clustering. Applied at the SINK boundary (file
    clustering before a committed write), NOT mid-pipeline: range
    partitioning samples its child to pick bounds, which would evaluate
    the signature UDF twice if placed before the persist point."""
    if n_partitions is None:
        n_partitions = int(sigs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return sigs.repartitionByRange(n_partitions, F.col("minhash")[0], F.col("doc_id"))


def with_bands(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """signatures → bands frame (schema.BANDS): b rows per doc, band_hash
    = xxhash64(band_index, minhash slice). Pure SQL, exploded JVM-side."""
    b, r = cfg.bands, cfg.rows_per_band
    band_arr = F.expr(
        f"transform(sequence(0, {b - 1}), i -> xxhash64(i, slice(minhash, i*{r}+1, {r})))"
    )
    return signatures.select(
        "doc_id",
        "n_shingles",
        F.posexplode(band_arr).alias("band", "band_hash"),
    ).select("doc_id", "band", "band_hash", "n_shingles")
