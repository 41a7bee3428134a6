"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``dedup/queries.py`` (the SURVEY.md §2 qkey
registry); this module only adapts them to the driver's calling
convention and makes the package importable regardless of the driver's
working directory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full near-dup pipeline (signatures → LSH →
    verification → connected components) over sf0.001 documents,
    returning per-cluster stats. Driver checks rows > 0."""
    from dedup.config import HIGH_RECALL_CONFIG
    from dedup.pipeline import cluster_report, run_dedup
    from dedup.queries import documents_as_pages

    pages = documents_as_pages(spark, "/root/testdata/sf0.001")
    res = run_dedup(pages, HIGH_RECALL_CONFIG)
    return cluster_report(res.clusters)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dedup.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from dedup.queries import oracle_sql as _o

    return _o()
