"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of repeated fact-to-fact joins is the shuffle;
writing both sides bucketed on the join key (`bucketBy` + saveAsTable) lets
Spark plan a SortMergeJoin with NO Exchange on either side (SURVEY.md §4 /
pyspark guide "Partitioning & shuffle"). The reference has no analogue —
its DataLoader is single-node — this is pure Spark-first scale design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), key)
