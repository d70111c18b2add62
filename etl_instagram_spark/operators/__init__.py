from etl_instagram_spark.operators.merge import (
    MergeTable,
    anti_join_new,
    delete_by_key,
    dedup_latest,
    upsert,
    upsert_coalesce,
)

__all__ = [
    "MergeTable",
    "anti_join_new",
    "delete_by_key",
    "dedup_latest",
    "upsert",
    "upsert_coalesce",
]
