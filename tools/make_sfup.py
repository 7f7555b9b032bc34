"""Derive an up-scaled parquet directory from the driver's sf0.1
fixtures, for SCALING measurements only (never correctness — the
oracle gate stays on the driver's own data).

Usage: python tools/make_sfup.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 .derived/sf1

Scale model — "K× more transactions over the same catalog", the
direction a real warehouse grows:

* fact tables (orders, lineitem, events, documents, embeddings) are
  replicated K times with PRIMARY keys shifted into disjoint ranges;
* dimension keys (custkey/partkey/suppkey/user_id) are left alone, so
  per-entity fan-in deepens the way it does in production;
* event timestamps shift by one full span per copy (the timeline
  extends; sessionization stays realistic);
* document text is made UNIQUE per copy by suffixing every token with
  a copy tag — token/shingle counts per doc are unchanged (no hidden
  2x work) while shingle sets across copies are disjoint, so dedup
  output grows linearly instead of exploding on artificial clones;
* embeddings get deterministic md5-noise so copies aren't exact
  duplicate vectors (which would degenerate ANN candidate sets).

Everything is deterministic; re-running overwrites in place.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hivetomysql_spark.session import get_spark  # noqa: E402

COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else ".derived/sf1"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark(app_name="make_sfup")
    spark.sparkContext.setLogLevel("ERROR")

    def read(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: {df.count()} rows")

    for t in COPY_TABLES:
        write(read(t), t)

    orders = read("orders")
    ord_off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    write(
        _replicate(orders, factor, lambda k, df: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * ord_off)
        )),
        "orders",
    )

    li = read("lineitem")
    write(
        _replicate(li, factor, lambda k, df: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * ord_off)
        )),
        "lineitem",
    )

    ev = read("events")
    ev_off = ev.agg(F.max("event_id")).collect()[0][0] + 1
    span = ev.agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
    ).collect()[0][0] + 3600
    write(
        _replicate(ev, factor, lambda k, df: df.withColumn(
            "event_id", F.col("event_id") + F.lit(k * ev_off)
        ).withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {k * span} SECONDS")
        )),
        "events",
    )

    docs = read("documents")
    doc_off = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    def salt_docs(k, df):
        if k == 0:
            return df
        out = df.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", rf"$1q{k}")
        )
        return out.withColumn("n_chars", F.length("text")).withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * doc_off)
        )

    write(
        _replicate(docs, factor, lambda k, df: salt_docs(k, df)).select(
            docs.columns
        ),
        "documents",
    )

    emb = read("embeddings")
    vec_off = emb.agg(F.max("vec_id")).collect()[0][0] + 1

    def perturb(k, df):
        if k == 0:
            return df
        noisy = F.transform(
            "embedding",
            lambda x, i: (
                x
                + (
                    F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(k)), F.lit(1000))
                    / 1000.0
                    - 0.5
                )
                * 0.02
            ).cast("float"),
        )
        return df.withColumn("embedding", noisy).withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * vec_off)
        )

    write(
        _replicate(emb, factor, perturb).select(emb.columns), "embeddings"
    )
    print(f"wrote factor-{factor} derivation of {src} to {dst}")


def _replicate(df, factor, shift):
    out = None
    for k in range(factor):
        part = shift(k, df)
        out = part if out is None else out.unionByName(part)
    return out


if __name__ == "__main__":
    main()
