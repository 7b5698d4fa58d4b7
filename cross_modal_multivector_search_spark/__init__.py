"""PySpark-native cross-modal multi-vector (vector-set) search engine.

A from-scratch re-expression of the capabilities of the reference system
``ytj0604/cross-modal-multivector-search`` (a RoarGraph fork: graph-ANN
candidate generation + smooth-Chamfer / MaxSim set-to-set reranking) as an
idiomatic Spark engine, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
such an engine needs at 100 TB scale.

Layout:
  functions/   column-level vector & scoring expressions (JVM-side first)
  operators/   exact kNN, set-to-set top-k, rerank, recall, dedup, text,
               RoarGraph build + multi-vector beam search
  sources/     fbin/ibin (reference binary formats) <-> DataFrame
  plans/       plan-inspection helpers (explain audits)
  streaming/   structured-streaming variants of pipeline operators
"""

__version__ = "0.1.0"
