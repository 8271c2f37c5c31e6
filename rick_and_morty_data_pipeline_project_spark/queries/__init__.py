from rick_and_morty_data_pipeline_project_spark.queries.catalog import (
    QUERIES,
    oracle_sql_dict,
    queries_dict,
)

__all__ = ["QUERIES", "queries_dict", "oracle_sql_dict"]
