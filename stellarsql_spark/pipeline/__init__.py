"""LLM-data-pipeline operators (SURVEY.md §2 B50–B55 + extensions):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal column plumbing."""
