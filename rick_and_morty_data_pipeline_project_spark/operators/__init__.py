from rick_and_morty_data_pipeline_project_spark.operators.topk import (
    top2_emotions_cols,
    two_stage_topk,
)

__all__ = ["two_stage_topk", "top2_emotions_cols"]
