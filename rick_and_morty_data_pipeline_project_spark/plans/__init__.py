from rick_and_morty_data_pipeline_project_spark.plans.explain_utils import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)

__all__ = ["formatted_plan", "has_broadcast_join", "pushed_filters"]
