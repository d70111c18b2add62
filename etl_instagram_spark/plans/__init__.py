from etl_instagram_spark.plans.oracle import all_oracle_sql
from etl_instagram_spark.plans.queries import all_queries

__all__ = ["all_oracle_sql", "all_queries"]
