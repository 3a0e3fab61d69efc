"""Kernel-backed Spark side of dup_char_kgram_fraction (round 7).

The two-dialect SQL template (operators/text_queries.q_dup_char_kgram_
fraction) folds every 50-char window's polynomial hash with a
higher-order lambda; DuckDB executes that fine, but Spark evaluates HOF
lambdas interpreted — O(n_chars x K) interpreted steps measured minutes
at sf0.1. The registry therefore runs the window generation through the
O(n_chars) Rabin-Karp kernel (kernels/rollhash.py, identical integers,
equality fold-vs-kernel asserted over the corpus + adversarial unicode
in tests/test_dup_window.py) inside mapInPandas, and the counting tail
is the SAME SQL string both dialects share (dup_char_tail_sql).

Scale shape: the kernel crossing is repartitioned on doc_id first (the
CLAUDE.md single-file gotcha) and emits ~n_chars rows per doc; the tail
is the two-level map-side-combinable hash-agg + equi-join shape of
dup_window_fraction. DuckDB oracle: the unchanged SQL-fold template.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.rollhash import window_hashes_batched
from ..operators.text_queries import CHAR_KGRAM, dup_char_tail_sql

WINS_SCHEMA = "doc_id bigint, h bigint"


def _emit_windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        di, w = window_hashes_batched(pdf["text"].tolist(), CHAR_KGRAM)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].to_numpy()[di], "h": w}
        )


def dup_char_kgram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    wins = docs.repartition(n_part, "doc_id").mapInPandas(
        _emit_windows, WINS_SCHEMA
    )
    wins.createOrReplaceTempView("_char_kgram_wins")
    return spark.sql(dup_char_tail_sql("_char_kgram_wins"))
