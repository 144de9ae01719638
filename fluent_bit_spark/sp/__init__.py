"""Stream-processor SQL engine: the reference's SQL dialect
(src/stream_processor/README.md, parser/sql.y) parsed and compiled to
Spark DataFrame plans."""

from fluent_bit_spark.sp.compiler import SpEngine, SpSqlError  # noqa: F401
