"""Cross-cutting scalar-function surface (SURVEY.md §2.7) — the
record-accessor template language plus misc format helpers."""

from fluent_bit_spark.functions.record_accessor import (  # noqa: F401
    ra_translate,
    ra_regex_match,
)
