from rick_and_morty_data_pipeline_project_spark.functions.emotions import (
    EMOTIONS,
    LEXICON,
    emotion_score_cols,
    emotion_score_sqls,
)
from rick_and_morty_data_pipeline_project_spark.functions.textfns import (
    normalize_name_col,
    wiki_url_col,
)

__all__ = [
    "EMOTIONS",
    "LEXICON",
    "emotion_score_cols",
    "emotion_score_sqls",
    "normalize_name_col",
    "wiki_url_col",
]
