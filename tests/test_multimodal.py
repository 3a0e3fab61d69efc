"""Multimodal oracle validity: MULTIMODAL_ORACLE rebuilds the synthesized
page bytes in SQL via ascii codepoints, which equals bytes ONLY for pure
ASCII input — pin that assumption, and check the reconstruction bit-exactly
against io/synth.py without Spark in the loop."""

import duckdb
import numpy as np
import pandas as pd

from tests.conftest import SF_DIR
from usls_doc_spark.io.synth import synth_page
from usls_doc_spark.operators.multimodal import (
    MULTIMODAL_ORACLE,
    N_FEATURES,
    _fake_features,
)


def _con():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_documents_are_ascii():
    """The oracle's per-byte arithmetic assumes codepoint == byte."""
    con = _con()
    n = con.sql(
        r"SELECT count(*) FROM documents WHERE regexp_matches(text, '[^\x20-\x7e]')"
    ).fetchone()[0]
    assert n == 0, f"{n} non-ASCII documents break the multimodal oracle"


def test_oracle_matches_python_synth_bit_exact():
    con = _con()
    oracle = (
        con.sql(MULTIMODAL_ORACLE).df().sort_values("url").reset_index(drop=True)
    )
    docs = con.sql("SELECT doc_id, text, lang FROM documents").df()
    rows = []
    for _, r in docs.iterrows():
        p = synth_page(int(r.doc_id), r.text, r.lang)
        arr = np.frombuffer(p["html"], dtype=np.uint8)
        feats = _fake_features(arr)
        rows.append(
            (
                p["url"],
                len(arr),
                p["html"][:4].hex(),
                float(arr.mean()),
                int(len(arr) // 4096) + 1,
                *[float(v) for v in feats],
            )
        )
    cols = ["url", "n_bytes", "magic", "mean_byte", "n_frames"] + [
        f"f{j}" for j in range(N_FEATURES)
    ]
    py = pd.DataFrame(rows, columns=cols).sort_values("url").reset_index(drop=True)
    assert len(py) == len(oracle)
    for c in cols:
        a, b = py[c], oracle[c]
        if a.dtype.kind == "f":
            assert a.astype("float64").equals(b.astype("float64")), c
        else:
            assert a.astype(str).equals(b.astype(str)), c


def test_frame_sample_vs_python_reference(spark):
    """Fan-out semantics vs a plain-python replay over the REAL page
    bytes: per-doc frame count <= K, even stride, last frame partial,
    first frame always present, per-frame integer-sum mean."""
    import math

    import numpy as np

    from tests.conftest import SF_DIR
    from usls_doc_spark.io.synth import pages_from_documents
    from usls_doc_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_SAMPLE_K,
        multimodal_frame_sample,
    )

    pages = {
        r["url"]: bytes(r["html"])
        for r in pages_from_documents(spark, SF_DIR).select("url", "html").collect()
    }
    expected = {}
    for url, data in pages.items():
        arr = np.frombuffer(data, dtype=np.uint8)
        n_frames = math.ceil(len(arr) / FRAME_BYTES)
        step = math.ceil(n_frames / FRAME_SAMPLE_K)
        for fi in range(0, n_frames, step):
            fr = arr[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
            expected[(url, fi)] = (
                fi * FRAME_BYTES, len(fr),
                int(fr.sum(dtype=np.int64)) / len(fr), int(fr[0]),
            )

    got = {
        (r["url"], r["frame_id"]): (
            r["frame_off"], r["frame_len"], r["mean_byte"], r["first_byte"]
        )
        for r in multimodal_frame_sample(spark, SF_DIR).collect()
    }
    assert got == expected
    per_doc = {}
    for url, _fi in got:
        per_doc[url] = per_doc.get(url, 0) + 1
    assert all(1 <= n <= FRAME_SAMPLE_K for n in per_doc.values())
    assert set(per_doc) == set(pages)  # every doc sampled, frame 0 always
    assert any(v[1] < FRAME_BYTES for v in got.values())  # partial tail frame
    assert any(n == FRAME_SAMPLE_K for n in per_doc.values())  # full-K docs
