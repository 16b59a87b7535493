"""Extension operators for LLM-scale data pipelines (SURVEY.md §2.11):
deduplication, similarity search, text analysis, multimodal columns."""
