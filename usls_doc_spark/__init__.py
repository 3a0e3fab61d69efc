"""usls_doc_spark — a PySpark-native document layout & main-content extraction engine.

Built from scratch against the behavior of the reference library
``nazeling/usls-doc`` (Rust + ONNXRuntime document-layout/OCR inference, studied
read-only at /root/reference). This is NOT a port: the reference's hand-fused
batch dataflow (DataLoader -> Processor -> Engine -> postprocess) is re-expressed
as Spark DataFrame plans plus Arrow-batched pandas UDFs, with Catalyst handling
pushdown/pruning/AQE and explicit partitioning for skew.

Layout:
    kernels/    pure numpy/python operator kernels (unit-testable without Spark)
    pipeline/   Spark DataFrame stages (extraction, layout, checkpoint, skew)
    operators/  large-scale training-data ops (dedup, similarity, text analysis)
    io/         deterministic synthetic pages source, table loaders
    streaming/  Structured Streaming variants
"""

__version__ = "0.1.0"
