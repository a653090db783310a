"""Sources & sinks (SURVEY.md §2 B-1): parquet/csv/json read+write."""
