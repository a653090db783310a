"""Scalar function families + UDF/UDAF/UDTF surface (SURVEY.md §2 B-8, B-10)."""
