"""D2 salted-join correctness: the salted hot-bucket join must emit the
EXACT pair set of the plain equi-join (SURVEY.md §5.2.3, §7 hard part 2
"salting without pair loss")."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.candidates import bucket_stats, lsh_candidates
from dedup.config import DEFAULT_CONFIG
from dedup.ingest import representatives, to_docs
from dedup.signatures import with_bands, with_shingles, with_signatures
from dedup.skew import salted_lsh_candidates, split_hot_cold


def _bands(spark, tiny_pages_df, cfg):
    docs = to_docs(tiny_pages_df, cfg)
    sh = with_shingles(representatives(docs, cfg), cfg)
    return with_bands(with_signatures(sh, cfg), cfg).persist()


def test_salted_equals_plain_pairs(spark, tiny_pages_df):
    # thresh=3 forces many buckets (incl. boilerplate hot ones) down the
    # salted path; n_salt=4 exercises real block fan-out
    cfg = DEFAULT_CONFIG.with_(salt_hot_thresh=3, n_salt=4)
    bands = _bands(spark, tiny_pages_df, cfg)
    try:
        plain = {(r.src, r.dst) for r in lsh_candidates(bands, cfg).collect()}
        salted = {(r.src, r.dst) for r in salted_lsh_candidates(bands, cfg).collect()}
        assert plain == salted
        assert len(plain) > 0
    finally:
        bands.unpersist()


def test_hot_cold_split_covers_everything(spark, tiny_pages_df):
    cfg = DEFAULT_CONFIG
    bands = _bands(spark, tiny_pages_df, cfg)
    try:
        hot, cold, hot_keys = split_hot_cold(bands, hot_thresh=3)
        assert hot.count() + cold.count() == bands.count()
        # hot rows really belong to oversized buckets
        sizes = bucket_stats(bands)
        n_hot_rows = (
            sizes.filter(F.col("bucket_size") > 3)
            .agg(F.sum("bucket_size"))
            .collect()[0][0]
        )
        assert (n_hot_rows or 0) == hot.count()
    finally:
        bands.unpersist()


def test_salted_off_is_plain_join(spark, tiny_pages_df):
    cfg = DEFAULT_CONFIG  # salt_hot_thresh=0 → fall through to plain path
    bands = _bands(spark, tiny_pages_df, cfg)
    try:
        plain = {(r.src, r.dst) for r in lsh_candidates(bands, cfg).collect()}
        off = {(r.src, r.dst) for r in salted_lsh_candidates(bands, cfg).collect()}
        assert plain == off
    finally:
        bands.unpersist()
