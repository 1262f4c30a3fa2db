"""Structured Streaming surface: event streams, sessionization, ingest
pipelines, and model scoring.

This __init__ exists (rather than relying on an implicit namespace
package) so the package imports from the ``addPyFile`` source zip on
executor python workers — zipimport resolves regular packages only, and
the stateful session kernel is pickled by reference to
``data_warehouse_product_mix_clustering_spark.streaming.sessions`` (sources/registry.py::
_ensure_worker_imports has the full story)."""
