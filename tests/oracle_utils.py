"""Shared Spark-vs-DuckDB comparison harness for oracle-parity tests —
the same shape as the driver's correctness gate (row-count + schema +
order-insensitive value comparison with columns sorted by name)."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def register_views(spark, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    """Exact comparison (float columns bitwise via float64 equality).

    Type-strict across the numeric divide: an integer column on one side
    and a float column on the other FAILS even if values coincide after
    float64 coercion — the driver's hash is type-sensitive, and coercing
    here is exactly the blind spot that let host_graph_pagerank's HUGEINT
    oracle output (pandas-materialized as float64) stay locally green
    while the round-5 driver row went red (VERDICT r5 #2)."""
    s = normalize(spark_df.toPandas())
    o = normalize(duck_rel.df())
    if list(s.columns) != list(o.columns):
        return False, f"columns differ: {list(s.columns)} vs {list(o.columns)}"
    if s.shape != o.shape:
        return False, f"shape differs: {s.shape} vs {o.shape}"
    for c in s.columns:
        a, b = s[c], o[c]
        int_vs_float = {a.dtype.kind, b.dtype.kind} == {"i", "f"} or (
            {a.dtype.kind, b.dtype.kind} == {"u", "f"}
        )
        if int_vs_float:
            return False, (
                f"col {c} dtype mismatch across the int/float divide: "
                f"spark={a.dtype} vs oracle={b.dtype} — the driver's hash is "
                "type-sensitive; cast the oracle (or the Spark side) explicitly"
            )
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            ok = a.astype("float64").equals(b.astype("float64"))
        else:
            ok = a.astype(str).equals(b.astype(str))
        if not ok:
            mism = (a.astype(str) != b.astype(str)).idxmax()
            return False, f"col {c} differs, e.g. row {mism}: {a[mism]!r} vs {b[mism]!r}"
    return True, "ok"
