"""SLANet-style table-structure decode (SURVEY.md §2.7 dead-but-informative:
the reference fork never wires SLANet into its module tree, but the decode
semantics at /root/reference/src/models/slanet/impl.rs:48-105 are part of
the documented operator inventory).

Semantics: per image, two heads — token logits [T, V] and cell-corner
bboxes [T, 8] (normalized x1,y1..x4,y4). Per step argmax token; stop on
EOS, skip SOS; `<td>`-class tokens emit a 4-corner keypoint cell scaled by
the original image size; decoded tokens are wrapped in
``<html><body><table> ... </table></body></html>``; an empty decode yields
no html at all (impl.rs:97-102).
"""

from __future__ import annotations

import numpy as np

TD_TOKENS = ("<td>", "<td", "<td></td>")  # slanet td-token set


def decode_table_structure(
    token_logits: np.ndarray,
    cell_bboxes: np.ndarray,
    vocab: list[str],
    image_h: float,
    image_w: float,
    sos_id: int = 0,
    eos_id: int = 1,
) -> tuple[list[str], list[np.ndarray]]:
    """Returns (html token list, list of [4,3] cell keypoints (x, y, id)).

    Mirrors slanet/impl.rs:56-103 step-for-step: argmax per step, EOS break,
    SOS skip, td-token -> 4 corners scaled to the original image.
    """
    logits = np.asarray(token_logits, dtype=np.float32)
    cells = np.asarray(cell_bboxes, dtype=np.float32)
    texts = ["<html>", "<body>", "<table>"]
    kpts: list[np.ndarray] = []
    for i in range(len(logits)):
        token_id = int(np.argmax(logits[i]))
        if token_id == eos_id:
            break
        if token_id == sos_id:
            continue
        token = vocab[token_id]
        if token in TD_TOKENS:
            xs = cells[i, 0::2] * np.float32(image_w)
            ys = cells[i, 1::2] * np.float32(image_h)
            kpts.append(
                np.stack([xs[:4], ys[:4], np.arange(4, dtype=np.float32)], axis=1)
            )
        texts.append(token)
    if len(texts) == 3:  # nothing decoded -> no html (impl.rs:97-99)
        return [], kpts
    texts.extend(["</table>", "</body>", "</html>"])
    return texts, kpts
