"""openlogparse_spark — a PySpark-native log parse → enrich → route → aggregate engine.

A brand-new implementation (NOT a port) with the capabilities of the reference
``uestc-zb/openlogparse`` (a C++ Oracle redo-log CDC pipeline, itself a fork of
OpenLogReplicator).  The reference's semantics — template-dispatch parsing,
dictionary lookup enrichment, routed fan-out sinks with per-sink counters,
stable per-key ordering, checkpointed idempotent resume — are re-expressed as
declarative ``pyspark.sql`` plans (Catalyst-optimized) plus a small number of
vectorized pandas/Arrow UDF stages where Spark lacks the operator.

Package map (reference parity cited per module):
  fixtures/    deterministic synthetic transcripts + dims + routes (FIXTURES.md)
  parse/       tokenize + Drain-style template mining + grok extraction
               (ref: src/parser/Parser.cpp opcode dispatch, src/parser/OpCode*.h)
  enrich/      broadcast lookup joins (ref: src/metadata/Schema.h checkTableDict)
  route/       condition-filtered fan-out writes with salted repartition
               (ref: src/writer/Writer*.cpp, src/common/expression/Expression.cpp)
  aggregate/   per-template/hourly rollups + transaction semantics
               (ref: src/common/metrics/Metrics.h, src/parser/Transaction.cpp)
  manifest.py  per-stage/per-sink lineage + idempotent resume
               (ref: src/metadata/Metadata.cpp:360-460, src/writer/Writer.cpp:364-445)
  functions/   training-data ops: dedup, similarity, text analysis, multimodal
  streaming/   Structured Streaming variant (watermark + stateful sessions)
"""

__version__ = "0.1.0"
