"""North-star extension operators (SURVEY.md §2.F, BASELINE.json):
the LLM-training-data-pipeline surface — deduplication, similarity
search, text analysis, multimodal columns — built Spark-first over the
documents/embeddings fixtures.
"""

from streamingdemo_spark.extensions import (  # noqa: F401
    corpus,
    dedup,
    graph,
    retrieval,
    similarity,
    text,
    multimodal,
)
