"""Scale-adaptive state partitioning for the drained streaming queries
(round 8, guide §2.2/§2.5: make partitioning scale with the data, not
with a constant tuned for either local mode or the cluster).

A Structured Streaming stateful operator pins its partition count to
``spark.sql.shuffle.partitions`` at stream start, and EVERY micro-batch
pays per-partition state-store overhead (open, delta write, snapshot,
commit) whether or not rows arrived: measured on this box, a ZERO-row
micro-batch of the attribution join cost 3.4 s at 32 state partitions
and 0.7 s at 8 (per-partition state machinery, not compute). Sizing
state partitions to the input instead of the core count removes that
constant without giving up cluster scale:

  partitions = clamp(ceil(input_bytes / target_bytes), lo,
                     session shuffle.partitions)

The session's configured shuffle.partitions stays the CEILING — on a
real cluster with thousands of shuffle partitions and TB inputs the
formula saturates at the configured value, so this only ever SHRINKS
the state layout for small inputs (the streaming analogue of AQE
partition coalescing, which does not apply to stateful streaming).
``target_bytes`` defaults to 512 KiB of compressed source parquet per
state partition (~a few MB of in-store state here) and can be raised
for production stores via USLS_STREAM_STATE_TARGET_BYTES.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_TARGET_BYTES = int(
    os.environ.get("USLS_STREAM_STATE_TARGET_BYTES", str(512 * 1024))
)


def scaled_state_partitions(
    spark: SparkSession, *input_paths: str, lo: int = 2
) -> int:
    hi = int(spark.conf.get("spark.sql.shuffle.partitions"))
    total = 0
    for p in input_paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            return hi  # unknown input — keep the session layout
    return max(lo, min(hi, math.ceil(total / _TARGET_BYTES)))


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` to a drained stream run.
    The stateful operator captures the value at stream start and pins it
    in the checkpoint; restoring the previous value afterwards keeps the
    session's batch queries untouched."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
