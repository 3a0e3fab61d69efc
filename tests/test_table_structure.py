"""SLANet-style table-structure decode tests (slanet/impl.rs:48-105)."""

import numpy as np

from usls_doc_spark.kernels.table_structure import decode_table_structure

VOCAB = ["<sos>", "<eos>", "<tr>", "</tr>", "<td>", "</td>"]


def _logits(ids):
    out = np.zeros((len(ids), len(VOCAB)), dtype=np.float32)
    for t, i in enumerate(ids):
        out[t, i] = 1.0
    return out


def test_decode_table_with_cells():
    # sos, <tr>, <td>, </td>, <eos>, (junk after eos must be ignored)
    ids = [0, 2, 4, 5, 1, 2]
    cells = np.zeros((len(ids), 8), dtype=np.float32)
    cells[2] = [0.1, 0.2, 0.5, 0.2, 0.5, 0.6, 0.1, 0.6]  # the <td> step
    texts, kpts = decode_table_structure(_logits(ids), cells, VOCAB, image_h=100, image_w=200)
    assert texts == ["<html>", "<body>", "<table>", "<tr>", "<td>", "</td>",
                     "</table>", "</body>", "</html>"]
    assert len(kpts) == 1
    # corners scaled by (w, h); ids 0..3
    assert np.allclose(kpts[0][:, 0], [20, 100, 100, 20])
    assert np.allclose(kpts[0][:, 1], [20, 20, 60, 60])
    assert kpts[0][:, 2].tolist() == [0, 1, 2, 3]


def test_decode_empty_yields_no_html():
    ids = [0, 1]  # sos then eos
    texts, kpts = decode_table_structure(
        _logits(ids), np.zeros((2, 8), dtype=np.float32), VOCAB, 10, 10
    )
    assert texts == [] and kpts == []
