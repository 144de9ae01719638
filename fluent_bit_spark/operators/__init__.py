"""Operator library: parse, filter, enrich, route, aggregate, dedup,
similarity, text-analysis, multimodal, skew — each a composable
DataFrame -> DataFrame transformation built on pyspark.sql builtins,
with Arrow-vectorized pandas UDFs only where builtins can't express
the semantics."""
