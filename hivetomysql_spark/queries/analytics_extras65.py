"""Analytics extras, batch 65: the second principal component by
deflation.

Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
nothing); SURVEY.md §2.2 extension-tier entry:

* PCA second component — power iteration with v1 projected out
  after every matrix-vector product (Hotelling deflation): the step
  that turns `embedding_pca_power_iteration`'s top direction into a
  usable 2-D projection basis, with the orthogonality and
  eigenvalue-ordering invariants reported (and asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table

_P2_DIM = 64
_P2_ITERS = 3


def _pca2_oracle() -> str:
    v0 = "[" + ", ".join(["0.125"] * _P2_DIM) + "]::DOUBLE[]"
    w0 = (
        "["
        + ", ".join("0.125" if i % 2 == 0 else "-0.125" for i in range(_P2_DIM))
        + "]::DOUBLE[]"
    )
    sql = f"""
    WITH e AS (
      SELECT embedding::DOUBLE[] AS x FROM embeddings
    ),
    dims AS (SELECT i FROM generate_series(1, {_P2_DIM}) t(i)),
    mu AS (
      SELECT list(m ORDER BY i) AS mu FROM (
        SELECT i, AVG(x[i]) AS m FROM e, dims GROUP BY i
      )
    ),
    v0 AS (SELECT {v0} AS v)
    """
    prev = "v0"
    for it in range(1, _P2_ITERS + 1):
        sql += f"""
    , adots{it} AS (
      SELECT x,
             list_dot_product(x, v) - list_dot_product(mu, v) AS d
      FROM e CROSS JOIN {prev} CROSS JOIN mu
    ),
    as{it} AS (
      SELECT i, SUM(x[i] * d) - MIN(mu[i]) * SUM(d) AS s
      FROM adots{it} CROSS JOIN mu, dims GROUP BY i
    ),
    an{it} AS (SELECT sqrt(SUM(s * s)) AS nrm FROM as{it}),
    v{it} AS (
      SELECT list(s / nrm ORDER BY i) AS v
      FROM as{it} CROSS JOIN an{it}
    )
        """
        prev = f"v{it}"
    v1 = f"v{_P2_ITERS}"
    sql += f"""
    , w0raw AS (SELECT {w0} AS w),
    w0 AS (
      -- deflate the start: w <- w - (w.v1) v1
      SELECT list_transform(range(1, {_P2_DIM} + 1),
               i -> w[i] - list_dot_product(w, v) * v[i]) AS w
      FROM w0raw CROSS JOIN {v1}
    )
    """
    prevw = "w0"
    for it in range(1, _P2_ITERS + 1):
        sql += f"""
    , bdots{it} AS (
      SELECT x,
             list_dot_product(x, w) - list_dot_product(mu, w) AS d
      FROM e CROSS JOIN {prevw} CROSS JOIN mu
    ),
    bs{it} AS (
      SELECT i, SUM(x[i] * d) - MIN(mu[i]) * SUM(d) AS s
      FROM bdots{it} CROSS JOIN mu, dims GROUP BY i
    ),
    braw{it} AS (
      SELECT list(s ORDER BY i) AS s FROM bs{it}
    ),
    bdef{it} AS (
      -- Hotelling deflation after every product
      SELECT list_transform(range(1, {_P2_DIM} + 1),
               i -> s[i] - list_dot_product(s, v) * v[i]) AS s
      FROM braw{it} CROSS JOIN {v1}
    ),
    bn{it} AS (
      SELECT sqrt(list_dot_product(s, s)) AS nrm FROM bdef{it}
    ),
    w{it} AS (
      SELECT list_transform(s, z -> z / nrm) AS w
      FROM bdef{it} CROSS JOIN bn{it}
    )
        """
        prevw = f"w{it}"
    w_last, bn_last, an_last = f"w{_P2_ITERS}", f"bn{_P2_ITERS}", f"an{_P2_ITERS}"
    sql += f"""
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_vectors,
           ROUND({an_last}.nrm / ((SELECT COUNT(*) FROM e) - 1), 3)
             AS lambda_1,
           ROUND({bn_last}.nrm / ((SELECT COUNT(*) FROM e) - 1), 3)
             AS lambda_2,
           ROUND(({bn_last}.nrm) / ({an_last}.nrm), 4) AS lambda_ratio,
           ROUND(ABS(list_dot_product({w_last}.w, {v1}.v)), 6)
             AS ortho_check,
           ROUND({w_last}.w[1], 4) AS w_1,
           ROUND({w_last}.w[2], 4) AS w_2
    FROM {w_last} CROSS JOIN {v1} CROSS JOIN {bn_last} CROSS JOIN {an_last}
    """
    return sql


@register("embedding_pca_second_component", oracle=_pca2_oracle())
def embedding_pca_second_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second principal component by Hotelling deflation: run the
    same matrix-free power iteration as
    `embedding_pca_power_iteration` for v1, then iterate again from
    an alternating start with v1 PROJECTED OUT after every
    matrix-vector product (s <- s - (s.v1)v1) — the deflation that
    makes the iteration converge to the second eigenvector instead
    of drifting back to the first. Reports lambda_2, the
    lambda_2/lambda_1 spectrum ratio, and |v1.v2| (must be ~0) — the
    invariants that certify the 2-D projection basis a scatter-plot
    or whitening stage would use. On these near-isotropic random
    embeddings the ratio correctly reads ~1 (flat spectrum: there IS
    no dominant direction to find, and the query says so rather than
    inventing one).

    Scale: identical round shape to the first-component query — each
    round is one scan + a 64-bucket reduce with O(dim) driver state;
    deflation is O(dim) scalar math between rounds. Deterministic:
    fixed starts, fixed round counts, shared algebra with the
    oracle."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda v: v.cast("double")).alias("x")
    )
    e = e.localCheckpoint()
    dim = _P2_DIM
    mu_rows = (
        e.select(F.posexplode("x").alias("i", "val"))
        .groupBy("i")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["i"]] = r["m"]
    n = e.count()

    def mat_vec(v):
        """One C*v product: returns the un-normalized image s."""
        mudotv = sum(m * vi for m, vi in zip(mu, v))
        vlit = F.array(*[F.lit(c) for c in v])
        dots = e.select(
            "x",
            (
                F.aggregate(
                    F.zip_with(F.col("x"), vlit, lambda p, q: p * q),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                )
                - F.lit(mudotv)
            ).alias("d"),
        )
        sums = (
            dots.select(F.posexplode("x").alias("i", "val"), "d")
            .groupBy("i")
            .agg(
                F.sum(F.col("val") * F.col("d")).alias("sx"),
                F.sum("d").alias("sd"),
            )
            .collect()
        )
        s = [0.0] * dim
        for r in sums:
            s[r["i"]] = r["sx"] - mu[r["i"]] * r["sd"]
        return s

    # first component
    v = [1.0 / 8.0] * dim
    for _ in range(_P2_ITERS):
        s = mat_vec(v)
        nrm1 = sum(si * si for si in s) ** 0.5
        v = [si / nrm1 for si in s]
    # second component: alternating start, deflate start and every image
    w = [0.125 if i % 2 == 0 else -0.125 for i in range(dim)]
    wd = sum(a * b for a, b in zip(w, v))
    w = [a - wd * b for a, b in zip(w, v)]
    for _ in range(_P2_ITERS):
        s = mat_vec(w)
        sd = sum(a * b for a, b in zip(s, v))
        s = [a - sd * b for a, b in zip(s, v)]
        nrm2 = sum(si * si for si in s) ** 0.5
        w = [si / nrm2 for si in s]
    ortho = abs(sum(a * b for a, b in zip(w, v)))
    return spark.range(1).select(
        F.lit(n).cast("long").alias("n_vectors"),
        F.round(F.lit(nrm1 / (n - 1)), 3).alias("lambda_1"),
        F.round(F.lit(nrm2 / (n - 1)), 3).alias("lambda_2"),
        F.round(F.lit(nrm2 / nrm1), 4).alias("lambda_ratio"),
        F.round(F.lit(ortho), 6).alias("ortho_check"),
        F.round(F.lit(w[0]), 4).alias("w_1"),
        F.round(F.lit(w[1]), 4).alias("w_2"),
    )
