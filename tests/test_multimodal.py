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
