from bigdataminingproject_spark.functions.text import (
    ENGLISH_STOPWORDS,
    SKIPWORDS,
    alpha_tokens,
    preprocess_body,
    remove_stopwords,
    shingles,
    tokenize,
)

__all__ = [
    "ENGLISH_STOPWORDS",
    "SKIPWORDS",
    "alpha_tokens",
    "preprocess_body",
    "remove_stopwords",
    "shingles",
    "tokenize",
]
