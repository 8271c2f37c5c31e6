from rick_and_morty_data_pipeline_project_spark.sources.corpus import (
    TABLES,
    load_table,
    register_views,
)

__all__ = ["TABLES", "load_table", "register_views"]
