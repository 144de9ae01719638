"""fluent_bit_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the capabilities of Fluent Bit
(reference: /root/reference, v1.7.5 MapleLabs fork) as an idiomatic
Spark DataFrame / Structured Streaming engine:

    parse -> filter/enrich -> route -> output(+aggregate)

The reference is a single-node C event loop over msgpack chunks; this
package re-expresses the same semantics as declarative DataFrame plans
so Catalyst/Tungsten/AQE pick the physical strategy, and the job scales
to multi-executor clusters over Iceberg/parquet tables of conversation
transcripts (conv_id, turn_idx, role, text, tool, ts).

Nothing here is ported from the reference's C code; reference file:line
citations in docstrings document behavioral parity only.
"""

__version__ = "0.1.0"

from fluent_bit_spark.session import get_spark  # noqa: F401
