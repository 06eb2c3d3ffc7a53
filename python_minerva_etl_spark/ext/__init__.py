"""North-star extensions (SURVEY.md §2.11, BASELINE.json): the
LLM-training-data-pipeline operators — deduplication, similarity
search, text analysis, multimodal columns — designed for 100 TB scale
with exact small-n twins for the oracle gate."""
