"""Operator library: dedup (+ cluster resolution), similarity search,
text analysis, pairwise similarity (matric parity), deterministic
sampling/splitting, temporal (as-of) joins, and multimodal plumbing —
all Spark-first."""
