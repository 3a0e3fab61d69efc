"""Packed training-shard JSONL export — the terminal sink of the curation
pipeline (split_and_pack assigns split/pack_id; this writes the shards a
trainer consumes).

Determinism contract (invariant 4): shard membership and the BYTES of
every shard file are a pure function of the input — independent of input
partitioning, task count, or execution order. Achieved by:

  * shard = pack_id div packs_per_shard (pure arithmetic over the
    deterministic pack assignment);
  * one shuffle keyed on (split, shard): a (split, shard) pair lives in
    exactly one task, so each shard directory receives exactly ONE file;
  * sortWithinPartitions(split, shard, doc_id): rows of a shard are
    contiguous and doc_id-ordered inside their task, so the file's line
    order is total;
  * to_json over a fixed-field struct of string/bigint columns (no float
    formatting variance).

Scale shape: join packed assignments back to text on doc_id (both sides
shuffle-partitioned on doc_id upstream; at 100 TB this is the one big
equi-join), then one exchange on (split, shard) and a streaming sorted
write — no driver collection, no per-row Python. Shard size is governed
by packs_per_shard x PACK_BUDGET tokens, the knob that keeps output files
HDFS-block-sized at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_jsonl_shards(
    packed: DataFrame,
    docs: DataFrame,
    out_dir: str,
    packs_per_shard: int = 4,
) -> dict:
    """Write ``out_dir/split=<s>/shard=<k>/part-*.txt`` JSONL shards from a
    split_and_pack result joined back to document text. Returns a summary
    dict (docs, shards) computed from the written output."""
    rows = (
        packed.join(docs.select("doc_id", "text"), "doc_id")
        .withColumn(
            "shard", (F.col("pack_id") / packs_per_shard).cast("bigint")
        )
        .select(
            "split",
            "shard",
            "doc_id",
            F.to_json(
                F.struct("doc_id", "pack_id", "n_tokens", "text")
            ).alias("line"),
        )
    )
    (
        rows.repartition("split", "shard")
        .sortWithinPartitions("split", "shard", "doc_id")
        .select("split", "shard", "line")
        .write.partitionBy("split", "shard")
        .mode("overwrite")
        .text(out_dir)
    )
    spark = packed.sparkSession
    written = spark.read.text(out_dir)
    n_docs = written.count()
    n_shards = (
        spark.read.format("text")
        .option("pathGlobFilter", "*.txt")
        .load(out_dir)
        .inputFiles()
    )
    return {"docs": n_docs, "shards": len(set(n_shards))}


def export_from_sf(spark: SparkSession, sf_dir: str, out_dir: str,
                   packs_per_shard: int = 4) -> dict:
    """Convenience wrapper: run split_and_pack over ``sf_dir`` documents
    and export the shards."""
    from ..operators.text_queries import render_spark
    from ..queries import _register_views

    _register_views(spark, sf_dir)
    packed = spark.sql(render_spark("split_and_pack"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return export_jsonl_shards(packed, docs, out_dir, packs_per_shard)
