"""data_warehouse_product_mix_clustering_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``trungtranquoc/Data-Warehouse-Product-Mix-Clustering``
(a pandas/SQL dimensional-warehouse + product-clustering workload), extended
with the operators a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, streaming).

Design principles (see SURVEY.md):
- Declarative DataFrame/SQL plans; Catalyst does pushdown/pruning/join choice.
- Zero row-at-a-time Python UDFs in the hot path; Pandas UDFs (Arrow) only
  where built-ins genuinely can't express the semantics.
- Broadcast tiny dimensions, pre-partition big joins, AQE on.
"""

from data_warehouse_product_mix_clustering_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
