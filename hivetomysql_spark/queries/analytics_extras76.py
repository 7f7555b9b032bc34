"""Analytics extras, batch 76: crypto round-trip and checksum
validation — the PII-handling scalar surface.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing — its idea of value protection was quote-wrapping,
`470-508`, with the escaping results accidentally discarded);
SURVEY.md §2.2 extension-tier entries:

* AES round-trip — aes_encrypt/aes_decrypt over order ids: column-
  level encryption for PII columns in flight, with the round-trip
  identity counted (the oracle predicts the accounting).
* Luhn validation — Spark's built-in luhn_check cross-checked
  against a FIRST-PRINCIPLES SQL implementation of the Luhn
  algorithm on deterministically-constructed numbers: the builtin
  and the textbook must agree row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_AES_KEY = "0123456789abcdef"


@register(
    "func_aes_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
           TRUE AS all_ok
    FROM orders WHERE o_orderkey < 500
    """,
)
def func_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt / aes_decrypt
    (AES-128-GCM default) over the order key rendered as a PII-like
    string, with the round-trip identity decrypt(encrypt(x)) = x
    COUNTED — the accounting the oracle predicts exactly (every row
    must round-trip; any JVM/codec drift breaks the count). This is
    how a pipeline carries customer identifiers through untrusted
    storage: encrypt at ingest, decrypt inside the trusted boundary;
    the reference's answer was quote-wrapping whose escaping results
    were accidentally discarded (HiveToMysql.java:487-488).

    Shape: pure scan-stage expression work, one O(1) rollup."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    s = F.concat(F.lit("cust-"), F.col("o_orderkey").cast("string"))
    rt = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(concat('cust-', CAST(o_orderkey AS STRING)),"
        f" '{_AES_KEY}'), '{_AES_KEY}') AS STRING)"
    )
    flags = o.select((rt == s).alias("ok"))
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("ok").cast("long")).cast("long").alias("n_roundtrip_ok"),
        (F.count(F.lit(1)) == F.sum(F.col("ok").cast("long"))).alias(
            "all_ok"
        ),
    )


def _luhn_sql(num: str) -> str:
    """First-principles Luhn validity of a 10-digit string column:
    from the RIGHT, double every second digit, subtract 9 above 9,
    sum, valid iff sum % 10 = 0."""
    terms = []
    for pos in range(10):  # pos 0 = rightmost
        d = f"CAST(substr({num}, {10 - pos}, 1) AS INT)"
        if pos % 2 == 1:
            terms.append(
                f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END)"
            )
        else:
            terms.append(d)
    return f"(({' + '.join(terms)}) % 10 = 0)"


@register(
    "func_luhn_validation",
    oracle=f"""
    WITH nums AS (
      SELECT o_orderkey,
             lpad(CAST(o_orderkey AS VARCHAR), 9, '0')
               || CAST((o_orderkey * 7) % 10 AS VARCHAR) AS num
      FROM orders WHERE o_orderkey < 2000
    ),
    checked AS (
      SELECT o_orderkey, num, {_luhn_sql("num")} AS valid FROM nums
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_numbers,
           CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           ROUND(SUM(CASE WHEN valid THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
             AS valid_rate
    FROM checked
    """,
)
def func_luhn_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum validation surface: 10-digit account-like numbers
    constructed deterministically from order keys, validated with
    Spark's BUILT-IN luhn_check — while the DuckDB oracle recomputes
    Luhn from FIRST PRINCIPLES (double every second digit from the
    right, cast out nines, sum mod 10). The builtin and the textbook
    must produce identical counts: the engine's convenience function
    is verified against the algorithm's definition, the same
    cross-engine proof pattern as the pinned sketches. Luhn sits in
    every card/IMEI/account ingest path as the cheapest
    garbage-in filter.

    Shape: pure scan-stage expression work, one O(1) rollup."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    num = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 9, "0"),
        ((F.col("o_orderkey") * 7) % 10).cast("string"),
    )
    checked = o.select(num.alias("num")).select(
        F.expr("luhn_check(num)").alias("valid")
    )
    return checked.agg(
        F.count(F.lit(1)).cast("long").alias("n_numbers"),
        F.sum(F.col("valid").cast("long")).cast("long").alias("n_valid"),
        F.round(
            F.sum(F.col("valid").cast("long")) * 1.0 / F.count(F.lit(1)), 4
        ).alias("valid_rate"),
    )
