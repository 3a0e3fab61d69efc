"""Shared foreachBatch-sink read-back guard (round-3 ADVICE item 2).

A foreachBatch parquet sink directory is created by the FIRST micro-batch
write; if the source yields zero micro-batches (empty input dir, glob that
matches nothing) the directory never exists and a bare
``spark.read.parquet`` fails with path-not-found instead of returning the
empty result the drained stream semantically produced.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession


def read_sink_or_empty(spark: SparkSession, sink_dir: str, schema: str) -> DataFrame:
    """Read a foreachBatch parquet sink, or return an empty DataFrame with
    the declared output ``schema`` when no batch ever wrote it.

    The zero-batch case is detected by catching the read's
    path-not-found AnalysisException rather than a driver-side
    ``os.path.isdir`` — the local-filesystem check is always false for
    hdfs:// or s3a:// sink URIs, which a multi-executor deployment uses
    (round-4 ADVICE item 3)."""
    try:
        return spark.read.schema(schema).parquet(sink_dir)
    except AnalysisException as e:
        # prefer the structured error class (stable across Spark versions;
        # getCondition supersedes getErrorClass in Spark 4) and keep the
        # message-substring check only as a legacy fallback
        err_class = None
        for attr in ("getCondition", "getErrorClass"):
            getter = getattr(e, attr, None)
            if getter is not None:
                err_class = getter()
                if err_class:
                    break
        if (
            err_class == "PATH_NOT_FOUND"
            or (err_class is None
                and ("PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e)))
        ):
            return spark.createDataFrame([], schema)
        raise
