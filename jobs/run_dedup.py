"""Production entry point (SURVEY.md §3.2 EP1): staged, resumable
near-dup pipeline with committed snapshots, lineage, and metrics.

Run locally::

    python jobs/run_dedup.py --input /root/testdata/sf0.001/documents.parquet \
        --input-kind documents --warehouse /tmp/dedup_wh --run-id r1

Or on a cluster (BASELINE.json:6 "spark-submit --py-files")::

    python -m zipfile -c dedup.zip dedup/
    spark-submit --py-files dedup.zip jobs/run_dedup.py \
        --input s3://…/web_pages --warehouse s3://…/warehouse --run-id r1

Every stage is pure (read committed inputs → DataFrame → commit); a
stage whose ``(run_id, stage, config_hash)`` marker exists is SKIPPED
and its snapshot is reused — kill the job at any point and rerun with
the same ``--run-id`` to resume from the last committed stage. The
stage machinery lives in ``dedup.jobrunner`` (inside the shipped zip,
shared with jobs/curate_corpus.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup.config import DEFAULT_CONFIG, DedupConfig  # noqa: E402
from dedup.jobrunner import (  # noqa: E402,F401  (Runner re-exported for API compat)
    Runner,
    load_pages,
    run_dedup_job,
)
from dedup.tableio import TableIO  # noqa: E402

# back-compat alias: the original in-file name for the full stage graph
run = run_dedup_job


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of input pages")
    ap.add_argument("--input-kind", choices=["pages", "documents"], default="pages")
    ap.add_argument("--warehouse", required=True, help="TableIO root directory")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--config", help="JSON file with DedupConfig overrides")
    ap.add_argument(
        "--use-containment",
        action="store_true",
        help="also emit suffix-array 'substr' containment edges (E5) and "
        "include them in clustering",
    )
    ap.add_argument(
        "--assume-unique-urls",
        action="store_true",
        help="input is pre-deduplicated by url: skip the latest-capture "
        "aggregation (the ingest's largest shuffle)",
    )
    ap.add_argument(
        "--n-buckets",
        type=int,
        default=0,
        help="commit docs and clusters bucketed by doc_id into this many "
        "buckets (0 = off): downstream clusters-docs joins run with zero "
        "Exchange on every resume",
    )
    args = ap.parse_args(argv)

    cfg = DEFAULT_CONFIG
    if args.config:
        with open(args.config) as f:
            cfg = DedupConfig(**{**json.load(f)})

    from dedup.session import get_spark

    spark = get_spark(app_name=f"dedup-{args.run_id}")
    tio = TableIO(spark, args.warehouse)
    pages = load_pages(spark, args.input, args.input_kind)
    r = run(spark, tio, cfg, args.run_id, pages,
            use_containment=args.use_containment,
            assume_unique_urls=args.assume_unique_urls,
            n_buckets=args.n_buckets)
    print(json.dumps({"run_id": args.run_id, "ran": r.ran, "skipped": r.skipped}))


if __name__ == "__main__":
    main()
