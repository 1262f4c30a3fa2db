from data_warehouse_product_mix_clustering_spark.functions.numeric import (
    money_round,
    ratio_round,
    sql_money_round,
    sql_ratio_round,
)

__all__ = ["money_round", "ratio_round", "sql_money_round", "sql_ratio_round"]
