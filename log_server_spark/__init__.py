"""log_server_spark — a brand-new PySpark-native analytics engine.

Re-expresses the capabilities of the reference log-server (see SURVEY.md)
as an idiomatic Spark batch parse -> enrich -> route -> aggregate DAG over
tables of Common-Crawl-style web pages, plus the training-data-pipeline
operators (dedup family, similarity search, text analysis, multimodal
plumbing) a 100 TB corpus job needs.

Everything here is public-knowledge PySpark; nothing is copied from the
reference (a Scala/Java native engine) — citations in docstrings point at
reference files only to document *semantics parity*.
"""

__version__ = "0.1.0"
