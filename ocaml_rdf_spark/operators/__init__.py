"""Composite/iterative operators: property paths, connected components,
dedup, similarity — the pieces Spark has no single built-in for
(SURVEY §2.5 and the training-pipeline operator set)."""
