"""Analytics extras, batch 73: rich-club structure and CR4
concentration.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* rich-club coefficient — edge density among the top-degree nodes
  relative to the whole graph: do the hubs preferentially trade
  with each other? Completes the co-purchase-graph toolkit
  (degree, triangles, clustering, assortativity, modularity,
  k-core, HITS).
* CR4 — the four-firm concentration ratio per brand market, the
  antitrust-style sibling of `supply_chain_hhi` (CR4 is what
  regulators quote; HHI is what they compute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_RC_TOP = 25


@register(
    "graph_rich_club",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey < 200
    ),
    epair AS (
      SELECT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT u AS n, COUNT(*) AS d FROM (
        SELECT u FROM epair UNION ALL SELECT v FROM epair
      ) t(u) GROUP BY u
    ),
    club AS (
      SELECT n FROM deg
      QUALIFY ROW_NUMBER() OVER (ORDER BY d DESC, n) <= {_RC_TOP}
    ),
    stats AS (
      SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM epair) AS n_edges,
             (SELECT COUNT(*) FROM epair e
              WHERE e.u IN (SELECT n FROM club)
                AND e.v IN (SELECT n FROM club)) AS club_edges
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST({_RC_TOP} AS BIGINT) AS club_size,
           CAST(club_edges AS BIGINT) AS club_edges,
           ROUND(club_edges * 2.0 / ({_RC_TOP} * ({_RC_TOP} - 1)), 6)
             AS club_density,
           ROUND(n_edges * 2.0 / (n_nodes * (n_nodes - 1.0)), 6)
             AS graph_density,
           ROUND((club_edges * 2.0 / ({_RC_TOP} * ({_RC_TOP} - 1)))
                 / (n_edges * 2.0 / (n_nodes * (n_nodes - 1.0))), 4)
             AS rich_club_ratio
    FROM stats
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the support->=2 co-purchase graph:
    edge density among the 25 highest-degree parts divided by the
    whole-graph density — a ratio well above 1 means the hubs form a
    tightly traded core (Zhou & Mondragon's internet finding; in a
    catalog it flags bundle ecosystems), near 1 means hub links
    spread evenly. Completes the co-purchase structural toolkit
    (degree distribution, triangles, clustering coefficient,
    assortativity, modularity, k-core, HITS).

    Shape: the pair fan-out reduces once; degrees, the top-k club
    (one ordered pick of 25), and the club-internal edge count are
    all O(edges) with the club broadcast into a semi-join."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") < 200
    )
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    epair = (
        a.join(b, "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nco"))
        .where(F.col("nco") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=False)  # degrees + club count reuse it
    )
    deg = (
        epair.select(F.col("u").alias("n"))
        .unionAll(epair.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    club = (
        deg.select(
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("d"), "n"))
            .alias("r"),
        )
        .where(F.col("r") <= _RC_TOP)
        .select("n")
    )
    cu = club.select(F.col("n").alias("cu"))
    cv = club.select(F.col("n").alias("cv"))
    club_edges = (
        epair.join(F.broadcast(cu), F.col("u") == F.col("cu"), "left_semi")
        .join(F.broadcast(cv), F.col("v") == F.col("cv"), "left_semi")
        .agg(F.count(F.lit(1)).alias("ce"))
    )
    totals = epair.agg(F.count(F.lit(1)).alias("ne")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("nn"))
    )
    j = totals.crossJoin(F.broadcast(club_edges))
    club_density = F.col("ce") * 2.0 / (_RC_TOP * (_RC_TOP - 1))
    graph_density = F.col("ne") * 2.0 / (F.col("nn") * (F.col("nn") - 1.0))
    return j.select(
        F.col("nn").cast("long").alias("n_nodes"),
        F.col("ne").cast("long").alias("n_edges"),
        F.lit(_RC_TOP).cast("long").alias("club_size"),
        F.col("ce").cast("long").alias("club_edges"),
        F.round(club_density, 6).alias("club_density"),
        F.round(graph_density, 6).alias("graph_density"),
        F.round(club_density / graph_density, 4).alias("rich_club_ratio"),
    )


@register(
    "supply_cr4_concentration",
    oracle="""
    WITH sales AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
             SUM(l.l_quantity) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT brand, q,
             ROW_NUMBER() OVER (PARTITION BY brand
                                ORDER BY q DESC, l_suppkey) AS r,
             SUM(q) OVER (PARTITION BY brand) AS tot,
             COUNT(*) OVER (PARTITION BY brand) AS n_sup
      FROM sales
    )
    SELECT brand,
           CAST(MAX(n_sup) AS BIGINT) AS n_suppliers,
           ROUND(SUM(CASE WHEN r <= 4 THEN q ELSE 0 END) / MAX(tot), 4)
             AS cr4,
           SUM(CASE WHEN r <= 4 THEN q ELSE 0 END) / MAX(tot) > 0.6
             AS concentrated_flag
    FROM ranked GROUP BY brand
    """,
)
def supply_cr4_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-firm concentration ratio per brand market: the top-4
    suppliers' share of shipped quantity, flagged above the 0.6
    oligopoly line — the regulator-quoted sibling of
    `supply_chain_hhi` (CR4 reads directly as 'four firms control
    X%'; HHI weighs the whole distribution). A CR4 near 4/n_sup
    means an even market; near 1 means four throats to choke.

    Shape: one joined reduce to (brand, supplier), per-brand rank
    and share windows, one rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sales = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    wb = Window.partitionBy("brand")
    ranked = sales.select(
        "brand",
        "q",
        F.row_number()
        .over(wb.orderBy(F.desc("q"), "l_suppkey"))
        .alias("r"),
        F.sum("q").over(wb).alias("tot"),
        F.count(F.lit(1)).over(wb).alias("n_sup"),
    )
    cr4 = F.sum(F.when(F.col("r") <= 4, F.col("q")).otherwise(0.0)) / F.max(
        "tot"
    )
    return ranked.groupBy("brand").agg(
        F.max("n_sup").cast("long").alias("n_suppliers"),
        F.round(cr4, 4).alias("cr4"),
        (cr4 > 0.6).alias("concentrated_flag"),
    )
