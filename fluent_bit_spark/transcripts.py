"""The transcript input table and its deterministic synthesis.

Target input (BASELINE.json `input_hint`): an Iceberg/parquet table of
multi-turn conversation transcripts:

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

In production this table is read directly (`read_transcripts`). For
tests/benchmarks the driver only ships a TPC-H-ish star schema plus an
`events` table, so we *derive* transcripts deterministically from
`events` with a pure SQL transformation that is maintained in two
dialects (Spark SQL and DuckDB SQL) producing byte-identical rows.
Every downstream correctness oracle prepends the DuckDB variant as a
CTE, which gives the driver's DuckDB-vs-Spark gate end-to-end coverage
of the whole pipeline, including per-turn text equality.

The generated `text` column cycles through the five log grammars the
reference ships parsers for (see /root/reference/conf/parsers.conf and
src/flb_parser_{regex,json,ltsv,logfmt}.c):

    event_id % 5 == 0 -> apache/nginx access-log line
                   1 -> logfmt line
                   2 -> JSON line (ragged keys, like the reference's
                        tests/internal/data/stream_processor/samples.json)
                   3 -> syslog RFC5424 line
                   4 -> LTSV line
    (event_id % 89 == 0 overrides with a corrupt line -> parse_ok=false path)

`role` is intentionally unnormalized (user/USER/human/ai/...) to
exercise the role-normalization enrich stage, and `tool` includes NULLs
and unknown tools to exercise the lookup-miss/default path (the shape of
the reference's apm_ldap DEFAULT, plugins/filter_apm_ldap/filter_ldap.h:28).

All numeric text payloads are integional (cents) — never raw doubles —
so Spark and DuckDB render identical strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# --- dialect snippets -------------------------------------------------------
_DIALECT = {
    "spark": {
        "@STR@": "STRING",
        # 01/Jan/2024:00:09:58 — matches DuckDB strftime with C locale
        "@APACHETS@": "date_format(ts, 'dd/MMM/yyyy:HH:mm:ss')",
    },
    "duckdb": {
        "@STR@": "VARCHAR",
        "@APACHETS@": "strftime(ts, '%d/%b/%Y:%H:%M:%S')",
    },
}

# Cents = CAST(round(value*100)) — identical in both engines for
# non-half-way doubles (the synthetic values are 2-decimal amounts).
_TEMPLATE = """
SELECT
  'conv-' || lpad(CAST(user_id AS @STR@), 8, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE
    WHEN event_type = 'click'    THEN (CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'human' END)
    WHEN event_type = 'view'     THEN (CASE WHEN event_id % 2 = 0 THEN 'USER' ELSE 'user' END)
    WHEN event_type = 'purchase' THEN (CASE WHEN event_id % 2 = 0 THEN 'assistant' ELSE 'ai' END)
    WHEN event_type = 'signup'   THEN (CASE WHEN event_id % 2 = 0 THEN 'Assistant' ELSE 'assistant' END)
    ELSE (CASE WHEN event_id % 2 = 0 THEN 'system' ELSE 'function' END)
  END AS role,
  CASE WHEN event_id % 89 = 0 THEN '!!corrupt ' || CAST(event_id AS @STR@)
  ELSE CASE CAST(event_id % 5 AS INT)
    WHEN 0 THEN '10.0.' || CAST(user_id % 256 AS @STR@) || '.1 - u' || CAST(user_id AS @STR@)
             || ' [' || @APACHETS@ || ' +0000] "GET /api/' || event_type || ' HTTP/1.1" '
             || CAST(CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS @STR@)
             || ' ' || CAST(CAST(round(value * 10) AS BIGINT) AS @STR@)
    WHEN 1 THEN 'level=' || (CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END)
             || ' msg="evt ' || event_type || '" latency_cents='
             || CAST(CAST(round(value * 100) AS BIGINT) AS @STR@) || ' ok=true'
    WHEN 2 THEN '<LB>"id": ' || CAST(event_id AS @STR@) || ', "word1": "' || event_type
             || '", "bytes": ' || CAST(CAST(round(value * 100) AS BIGINT) AS @STR@)
             || ', "usage": ' || CAST(event_id % 100 AS @STR@) || '<RB>'
    WHEN 3 THEN '<165>1 2024-01-01T00:00:00.000Z host' || CAST(user_id AS @STR@) || ' app '
             || CAST(event_id AS @STR@) || ' ID47 - ' || event_type || ' happened'
    ELSE 'k1:' || event_type || chr(9) || 'k2:' || CAST(user_id AS @STR@)
             || chr(9) || 'cents:' || CAST(CAST(round(value * 100) AS BIGINT) AS @STR@)
  END END AS text,
  CASE CAST(event_id % 8 AS INT)
    WHEN 0 THEN 'bash' WHEN 1 THEN 'python' WHEN 2 THEN 'browser' WHEN 3 THEN 'search'
    WHEN 4 THEN 'editor' WHEN 5 THEN 'sql' WHEN 6 THEN NULL
    ELSE 'unknown-tool-' || CAST(event_id % 3 AS @STR@)
  END AS tool,
  ts
FROM {events}
"""


def transcripts_sql(dialect: str, events: str = "events") -> str:
    """Transcript derivation SELECT for `dialect` ('spark'|'duckdb')."""
    sql = _TEMPLATE.format(events=events)
    for token, repl in _DIALECT[dialect].items():
        sql = sql.replace(token, repl)
    # JSON braces kept out of the template so str.format stays usable.
    return sql.replace("<LB>", "{").replace("<RB>", "}")


def oracle_cte(events: str = "events") -> str:
    """`WITH transcripts AS (...)` prefix for DuckDB oracle queries."""
    return f"WITH transcripts AS ({transcripts_sql('duckdb', events)})\n"


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views."""
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcript DataFrame from `events` at `sf_dir`.

    The window rank shuffles once by user_id; at production scale the
    table is read pre-materialized (`read_transcripts`) instead.
    """
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(transcripts_sql("spark"))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath.

    Resolves through Spark's DataSource registry first so jars added
    via --packages/spark.jars (MutableURLClassLoader, invisible to the
    system classloader) are found."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "iceberg", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_transcripts(
    spark: SparkSession, path: str, table_format: str = "parquet"
) -> DataFrame:
    """Production path: read a materialized transcript table.

    table_format='iceberg' reads through the Iceberg connector — an
    EXPLICIT gate (NotImplementedError when the runtime jar is absent,
    like the kafka source; this sandbox ships no Iceberg runtime), so a
    missing connector can never silently degrade the resume semantics
    that rely on Iceberg snapshot isolation / overwritePartitions.
    table_format='parquet' (default) reads plain files, where the
    checkpoint manifest (checkpoint.py) supplies idempotent resume via
    per-partition overwrite instead. Partition layout assumption at
    scale either way: days(ts) partitions, files clustered by conv_id
    so per-conversation windows mostly read co-located data.
    """
    if table_format == "iceberg":  # pragma: no cover - needs iceberg jar
        if not iceberg_available(spark):
            raise NotImplementedError(
                "iceberg runtime jar not on the classpath; pass "
                "table_format='parquet' (manifest-based resume) or add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars"
            )
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def synth_transcripts(
    spark: SparkSession, sf_dir: str, replicate: int = 1, hot_factor: int = 0
) -> DataFrame:
    """Benchmark-scale transcript synthesis: the deterministic derivation,
    optionally replicated `replicate`x (distinct event_ids and shifted ts,
    same grammar mix) to reach bench row counts.

    `hot_factor` > 0 adds Zipf-style conversation skew (FIXTURES.md §1):
    every 20th conversation receives `hot_factor`x extra replicas, so a
    few conversations hold a disproportionate share of turns —
    exercising the salting/skew paths. Deterministic; bench-only (the
    oracle-checked correctness path always uses replicate=1,
    hot_factor=0 where the derivation is dialect-exact)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if replicate > 1 or hot_factor > 0:
        n = events.agg(F.max("event_id")).collect()[0][0] + 1
        reps = F.when(
            (F.col("user_id") % 20 == 0) & (F.lit(hot_factor) > 0),
            F.lit(replicate * max(hot_factor, 1)),
        ).otherwise(F.lit(replicate))
        events = (
            events.withColumn("rep", F.explode(F.sequence(F.lit(0), reps - 1)))
            .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(n))
            .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("rep") * 7 + F.col("event_id") % 13))
            .drop("rep")
        )
    events.createOrReplaceTempView("events")
    return spark.sql(transcripts_sql("spark"))
