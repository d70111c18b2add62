from etl_instagram_spark.plans.oracle import all_oracle_sql
from etl_instagram_spark.plans.queries import all_queries

# imported for registration side effects (query/oracle decorators)
from etl_instagram_spark.plans import llm_queries  # noqa: E402,F401

__all__ = ["all_oracle_sql", "all_queries"]
