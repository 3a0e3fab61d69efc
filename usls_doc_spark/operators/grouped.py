"""Grouped-map (applyInPandas) operators — the custom-operator escape hatch
for semantics the built-in DataFrame ops can't express per group
(SURVEY.md §2.8 / pyspark guide: applyInPandas is preference (2) after
composition of built-ins).

These intentionally produce SQL-verifiable outputs so the oracle gate covers
the grouped-map execution path itself (Arrow group marshalling, per-group
pandas semantics, schema contract), not just built-in operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RANK_SCHEMA = "lang string, doc_id long, n_words int, lang_rank int, lang_docs int"


def _rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # deterministic ordering inside the group: n_words desc, doc_id asc
    pdf = pdf.sort_values(["n_words", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    pdf["lang_rank"] = pdf.index + 1
    pdf["lang_docs"] = len(pdf)
    return pdf[["lang", "doc_id", "n_words", "lang_rank", "lang_docs"]]


def lang_word_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc ranking by word count via applyInPandas.

    One shuffle on lang; each group is a single pandas DataFrame (group
    cardinality here is ~100s of rows — per-group memory is the documented
    constraint of grouped-map at scale: groups must fit in one worker)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "doc_id", F.size(F.split("text", " ")).cast("int").alias("n_words")
    )
    return docs.groupBy("lang").applyInPandas(_rank_group, schema=RANK_SCHEMA)


LANG_WORD_RANK_ORACLE = """
SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS INT)
         AS lang_rank,
       CAST(count(*) OVER (PARTITION BY lang) AS INT) AS lang_docs
FROM documents
"""
