"""Shared foreachBatch-sink read-back guard (round-3 ADVICE item 2).

A foreachBatch parquet sink directory is created by the FIRST micro-batch
write; if the source yields zero micro-batches (empty input dir, glob that
matches nothing) the directory never exists and a bare
``spark.read.parquet`` fails with path-not-found instead of returning the
empty result the drained stream semantically produced.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_sink_or_empty(spark: SparkSession, sink_dir: str, schema: str) -> DataFrame:
    """Read a foreachBatch parquet sink, or return an empty DataFrame with
    the declared output ``schema`` when no batch ever wrote it."""
    if not os.path.isdir(sink_dir):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(sink_dir)
