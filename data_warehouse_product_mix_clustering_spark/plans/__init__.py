from data_warehouse_product_mix_clustering_spark.plans.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
