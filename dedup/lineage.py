"""Per-partition lineage + per-stage metrics (SURVEY.md §4.2,
BASELINE.json:6 "per-partition lineage rows and metrics checkpointed").

Lineage capture is a pure-SQL aggregation over ``spark_partition_id()``
— one row per physical output partition with its row count — rather
than a pass-through Python shim: it costs one extra (cheap, JVM-only)
job per committed stage and keeps the data path free of any Python
crossing."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup.schema import LINEAGE, METRICS


def partition_lineage(
    df: DataFrame, run_id: str, stage: str, wall_ms: int | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """One lineage row per partition of ``df`` (schema.LINEAGE)."""
    spark = df.sparkSession
    agg = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("rows_out")
    )
    return (
        agg.withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_ms", F.lit(wall_ms).cast("long"))
        .withColumn("snapshot_id", F.lit(snapshot_id).cast("long"))
        .select([f.name for f in LINEAGE.fields])
    )


def metrics_rows(run_id: str, stage: str, values: dict[str, float]) -> list[dict]:
    return [
        {"run_id": run_id, "stage": stage, "key": k, "value": float(v)}
        for k, v in values.items()
    ]


def metrics_df(spark, run_id: str, stage: str, values: dict[str, float]) -> DataFrame:
    return spark.createDataFrame(metrics_rows(run_id, stage, values), schema=METRICS)


class StageTimer:
    """Context manager: wall-clock a stage for lineage/metrics."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.wall_ms = int((time.perf_counter() - self.t0) * 1000)
        return False
