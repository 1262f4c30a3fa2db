from data_warehouse_product_mix_clustering_spark.etl.star_schema import StarSchema, build_star_schema, star_sql

__all__ = ["StarSchema", "build_star_schema", "star_sql"]
