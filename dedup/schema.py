"""Fixed StructTypes for every frame in the pipeline (SURVEY.md §1.2).

Schemas are declared, never inferred — inference is nondeterministic
across samples and would break the byte-identical / resume contracts.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: canonical input table (BASELINE.json:15)
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

#: normalized working set; doc_id = xxhash64(url) — partition-independent
DOCS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("text", StringType(), True),
        StructField("norm_text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("n_chars", LongType(), True),
        StructField("content_sha", StringType(), True),
    ]
)

SIGNATURES = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("minhash", ArrayType(LongType(), False), False),
        StructField("simhash", LongType(), False),
        StructField("n_shingles", IntegerType(), False),
    ]
)

SHINGLES = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("shingles", ArrayType(LongType(), False), False),
        StructField("n_shingles", IntegerType(), False),
    ]
)

BANDS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("band", IntegerType(), False),
        StructField("band_hash", LongType(), False),
        StructField("n_shingles", IntegerType(), False),
    ]
)

EDGES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("est_jacc", DoubleType(), True),
        StructField("sim", DoubleType(), True),
        StructField("kind", StringType(), False),
    ]
)

CLUSTERS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("cluster_id", LongType(), False),
    ]
)

LINEAGE = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("rows_out", LongType(), False),
        StructField("wall_ms", LongType(), True),
        StructField("snapshot_id", LongType(), True),
    ]
)

METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("key", StringType(), False),
        StructField("value", DoubleType(), True),
    ]
)
