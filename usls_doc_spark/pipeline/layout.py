"""ONNX layout-model boundary: broadcast-once, per-executor lazy session.

Mirrors Engine::build/dry_run/run (/root/reference/src/misc/engine.rs:76-232)
re-expressed for Spark executors (SURVEY.md §2.3, §4):

  E1 build    — one ort session per PYTHON WORKER PROCESS, built lazily from
                model bytes shipped via ``spark.sparkContext.broadcast`` (the
                north-star "models broadcast once per executor"); module-level
                cache keyed by broadcast id so repeated UDF calls reuse it.
  E2 dry_run  — N warmup forwards on ones-tensors at the opt shape
                (default 3, engine.rs:65,147-196) at first use.
  E3 run      — one session.run per Arrow batch (whole [N,3,H,W] batch — no
                per-row Python).
  E4 EPs      — CPUExecutionProvider with intra_op_num_threads capped to 1:
                Spark already runs one task per core; ORT's default
                all-cores intra-op parallelism (engine.rs:435) would
                oversubscribe and destroy scaling efficiency (SURVEY.md §4).

onnxruntime is not installed in this sandbox — everything here is gated and
unit-testable only down to the gating; the deterministic StubLayoutModel
(kernels/stub_layout.py) serves the executable/CI path.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - not installed in this environment
    import onnxruntime as ort

    HAS_ORT = True
except ImportError:
    ort = None
    HAS_ORT = False

_SESSION_CACHE: dict[int, object] = {}

DRY_RUN_STEPS = 3  # engine.rs:65


def get_session(model_bytes_broadcast, warmup_shape=(1, 3, 1024, 1024)):
    """Lazy per-process session from a broadcast variable (E1+E2)."""
    if not HAS_ORT:
        raise ImportError(
            "onnxruntime is not available; use kernels.stub_layout.StubLayoutModel"
        )
    key = id(model_bytes_broadcast)
    sess = _SESSION_CACHE.get(key)
    if sess is None:
        opts = ort.SessionOptions()
        opts.intra_op_num_threads = 1  # one Spark task per core already
        opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        sess = ort.InferenceSession(
            model_bytes_broadcast.value,
            sess_options=opts,
            providers=["CPUExecutionProvider"],
        )
        name = sess.get_inputs()[0].name
        ones = np.ones(warmup_shape, dtype=np.float32)
        for _ in range(DRY_RUN_STEPS):  # E2 warmup
            sess.run(None, {name: ones})
        _SESSION_CACHE[key] = sess
    return sess


class OnnxLayoutModel:
    """Batch-forward wrapper: images [N,3,H,W] f32 -> raw preds [N,A,D].

    Drop-in for StubLayoutModel at the decode boundary — postprocessing
    (kernels/yolo_decode.py) is identical for both.
    """

    def __init__(self, model_broadcast, names):
        self._bc = model_broadcast
        self.names = tuple(names)

    def forward(self, batch_nchw: np.ndarray) -> np.ndarray:
        sess = get_session(self._bc, warmup_shape=batch_nchw.shape)
        name = sess.get_inputs()[0].name
        (out,) = sess.run(None, {name: batch_nchw.astype(np.float32)})  # E3
        return out
