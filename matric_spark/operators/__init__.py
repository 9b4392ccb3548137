"""Operator library: dedup, similarity search, text analysis, pairwise
similarity (matric parity), and multimodal plumbing — all Spark-first."""
