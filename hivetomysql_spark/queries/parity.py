"""Reference-parity queries: the hiveToMysql data path on fixtures.

These exercise SURVEY.md §2.1 operators #1-#6 — scan, static
partition filter, projection, rename, constant injection, NULL rule —
i.e. everything the reference does to data between Hive and MySQL
(HiveToMysql.java:221-229,141-169,382-459,443-446).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.config import DumpConf, DumpMap
from hivetomysql_spark.pipeline import run_pipeline
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

# The dump.conf / dump.map a reference user would write for the
# `events` table, targeting one day's partition.
_CONF_TEXT = "ds=2024-01-05\nmysql_table=events_daily\ndelete_before_dump=true\n"
_MAP_TEXT = (
    "event_id=event_id\n"
    "etype=event_type\n"
    "uid=user_id\n"
    "amount=value\n"
    "ds=$ds\n"
    "version=#2.0\n"
)


def parity_mapping_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = DumpConf.from_text(_CONF_TEXT)
    mapping = DumpMap.from_text(_MAP_TEXT, conf=conf)
    events = load_table(spark, sf_dir, "events")
    # the `ds=` analogue on the fixture: one day of event time
    # (reference: `where ds=<literal>` pushed into the scan,
    # HiveToMysql.java:227 — here Catalyst pushes the predicate into
    # the parquet scan)
    one_day = events.where(F.to_date("ts") == F.lit(conf.ds))
    return run_pipeline(one_day, conf, mapping)


@register(
    "parity_mapping",
    oracle="""
    SELECT event_id,
           event_type AS etype,
           user_id    AS uid,
           value      AS amount,
           '2024-01-05' AS ds,
           '2.0'        AS version
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-05'
    """,
)
def parity_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → partition filter → rename/project → constants (ops #1-#6)."""
    return parity_mapping_df(spark, sf_dir)


@register(
    "parity_null_rule",
    oracle="""
    SELECT event_id,
           CASE WHEN props = 'NULL' THEN NULL ELSE props END AS props_decoded
    FROM events
    WHERE event_type = 'error'
    """,
)
def parity_null_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's NULL decode (text 'NULL' ⇒ SQL NULL, op #6,
    HiveToMysql.java:443-446) as a column expression."""
    events = load_table(spark, sf_dir, "events")
    return events.where(F.col("event_type") == "error").select(
        "event_id",
        F.when(F.col("props") == "NULL", F.lit(None))
        .otherwise(F.col("props"))
        .alias("props_decoded"),
    )
