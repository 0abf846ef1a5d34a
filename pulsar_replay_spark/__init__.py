"""pulsar_replay_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``vbabenkoru/pulsar-replay`` (a Pulsar
capture/restore/replay toolkit + synthetic-message load generator), rebuilt
Spark-first rather than ported.

Layout:
  session    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
  envelope   — the message-envelope data model (SURVEY §1.2) + codecs
  catalog    — tenant/namespace/topic catalog operators (SURVEY §2.1/§2.6/§2.7)
  generator  — deterministic emailSend document generator (SURVEY §2.1 S9)
  functions/ — scalar function layer (codecs, text, vectors)
  operators/ — capture pipeline, relational corpus, dedup, similarity, multimodal
  sources/   — JSON capture-dir source/sink, optional Pulsar connector mapping
  streaming/ — Structured Streaming surface (bounded reads, watermarks, windows)
"""

__version__ = "0.1.0"
